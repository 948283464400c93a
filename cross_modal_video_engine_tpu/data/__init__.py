from .provider import LinasDataset, read_video2frames, get_video_id
