from .layers import BiGRU, ConvBank1D, MFC, LatentMapping
from .dual_encoding import (
    DualEncodingConfig, DualEncoding, VideoBatch, TextBatch,
    VideoMultilevelEncoding, TextMultilevelEncoding,
    make_video_batch, make_text_batch,
)
