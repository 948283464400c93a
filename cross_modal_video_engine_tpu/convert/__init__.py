from .torch_import import (
    convert_linas_dual_encoding, convert_clip_vit, convert_timesformer,
    load_torch_checkpoint,
)
