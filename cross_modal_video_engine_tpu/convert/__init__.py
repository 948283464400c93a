from .torch_import import (
    convert_linas_dual_encoding, convert_clip_vit, load_torch_checkpoint,
)
