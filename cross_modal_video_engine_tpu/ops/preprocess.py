"""On-device fused preprocessing.

The reference does per-frame PIL/cv2 preprocessing on host
(MultiFusion/src/data_utils.py:71-101 squarepad/targetpad + CLIP
normalize; MCT augmentations.py Resize/CenterCrop/Normalize).  Here the
pixel math runs on the TPU inside ONE jit: uint8 frames go over PCIe once,
and XLA fuses dequantize -> bilinear resize -> crop -> normalize -> dtype
cast into a single HBM pass feeding the patch-embed matmul.

Shapes are static per (input_size -> output_size) pair, so each
combination compiles exactly once.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# public CLIP normalization constants (data_utils.py:83)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
# mmaction TimeSformer normalize (configs/.../timesformer_*.py: mean/std 127.5)
TSF_MEAN = (127.5, 127.5, 127.5)
TSF_STD = (127.5, 127.5, 127.5)


def _resize_short_side(x: jnp.ndarray, short: int) -> jnp.ndarray:
    """Bilinear resize so min(H, W) == short, aspect preserved.
    x: (..., H, W, C) float."""
    h, w = x.shape[-3], x.shape[-2]
    if h <= w:
        nh, nw = short, int(round(w * short / h))
    else:
        nh, nw = int(round(h * short / w)), short
    return jax.image.resize(x, x.shape[:-3] + (nh, nw, x.shape[-1]),
                            method="bilinear")


def _center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    y0, x0 = (h - size) // 2, (w - size) // 2
    return x[..., y0:y0 + size, x0:x0 + size, :]


@functools.partial(jax.jit, static_argnames=("short_side", "crop_size",
                                             "mean", "std", "scale_to_unit",
                                             "out_dtype"))
def preprocess_frames(frames_u8: jnp.ndarray, short_side: int = 256,
                      crop_size: int = 224,
                      mean: Tuple[float, ...] = CLIP_MEAN,
                      std: Tuple[float, ...] = CLIP_STD,
                      scale_to_unit: bool = True,
                      out_dtype: str = "bfloat16") -> jnp.ndarray:
    """(F, H, W, 3) uint8 -> (F, crop, crop, 3) normalized.
    scale_to_unit: divide by 255 before mean/std (CLIP convention);
    False uses raw 0..255 pixels (mmaction mean/std 127.5 convention)."""
    x = frames_u8.astype(jnp.float32)
    if scale_to_unit:
        x = x / 255.0
    x = _resize_short_side(x, short_side)
    x = _center_crop(x, crop_size)
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    x = (x - m) / s
    return x.astype(jnp.bfloat16 if out_dtype == "bfloat16" else jnp.float32)


def _pad_to_square(x: jnp.ndarray) -> jnp.ndarray:
    """SquarePad (data_utils.py:23-38): symmetric zero-pad to square."""
    h, w = x.shape[-3], x.shape[-2]
    m = max(h, w)
    ph, pw = m - h, m - w
    pad = [(0, 0)] * (x.ndim - 3) + [(ph // 2, ph - ph // 2),
                                     (pw // 2, pw - pw // 2), (0, 0)]
    return jnp.pad(x, pad)


def _target_pad(x: jnp.ndarray, target_ratio: float) -> jnp.ndarray:
    """TargetPad (data_utils.py:71-101): pad only when the aspect ratio
    exceeds target_ratio, to bring it back to target_ratio."""
    h, w = x.shape[-3], x.shape[-2]
    actual = max(h, w) / min(h, w)
    if actual < target_ratio:
        return x
    scaled = int(max(h, w) / target_ratio)
    hp = max(scaled - h, 0)
    wp = max(scaled - w, 0)
    pad = [(0, 0)] * (x.ndim - 3) + [(hp // 2, hp - hp // 2),
                                     (wp // 2, wp - wp // 2), (0, 0)]
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("dim", "pad", "target_ratio"))
def clip_preprocess(frames_u8: jnp.ndarray, dim: int = 224,
                    pad: Optional[str] = "targetpad",
                    target_ratio: float = 1.25) -> jnp.ndarray:
    """The MultiFusion preprocessing pipeline (targetpad 1.25 -> resize ->
    center crop -> CLIP normalize), on device."""
    x = frames_u8.astype(jnp.float32) / 255.0
    if pad == "squarepad":
        x = _pad_to_square(x)
    elif pad == "targetpad":
        x = _target_pad(x, target_ratio)
    h, w = x.shape[-3], x.shape[-2]
    if h <= w:
        nh, nw = dim, max(dim, int(round(w * dim / h)))
    else:
        nh, nw = max(dim, int(round(h * dim / w))), dim
    x = jax.image.resize(x, x.shape[:-3] + (nh, nw, 3), method="bicubic")
    x = _center_crop(x, dim)
    m = jnp.asarray(CLIP_MEAN, jnp.float32)
    s = jnp.asarray(CLIP_STD, jnp.float32)
    return ((x - m) / s).astype(jnp.bfloat16)


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/p * W/p, p*p*C) without HBM round trips
    (pure reshape/transpose; feeds patch-embed as ONE matmul)."""
    *lead, H, W, C = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(*lead, gh, patch, gw, patch, C)
    ndim = x.ndim
    # (..., gh, p, gw, p, C) -> (..., gh, gw, p, p, C)
    perm = list(range(ndim - 5)) + [ndim - 5, ndim - 3, ndim - 4, ndim - 2,
                                    ndim - 1]
    x = x.transpose(*perm)
    return x.reshape(*lead, gh * gw, patch * patch * C)
