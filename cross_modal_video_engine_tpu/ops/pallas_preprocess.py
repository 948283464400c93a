"""Fused uint8 ingest: frames -> normalized patch tokens (device-side).

The north-star decode path is "pixels touch HBM once": the host ships
uint8 frames (3 bytes/pixel — 4x less relay/PCIe traffic than f32) and the
device fuses dequantize + per-channel normalize + patchify into the token
matrix the ViT patch-embedding GEMM consumes (reference preprocessing:
MultiFusion/src/data_utils.py:71-101, MCT Normalize augmentations.py:1423).

Implementation note (measured on v5e, 2026-08): a hand-written Pallas
kernel for this op is NOT shippable or needed —

* Mosaic refuses the core relayout: flattening a (32, 96) u8 tile into a
  3072-lane token row is a sublane->lane shape cast its layout inference
  rejects ("infer-vector-layout: unsupported shape cast"), for every
  blocking we tried (uint8 also needs an i32 hop to reach f32).
* XLA already compiles `u8_to_patches` to one fused relayout pass at
  ~386 GB/s effective (0.30 ms for 256 frames of 224^2); orderings
  (convert-first / relayout-first / bf16-mid) all fuse to the same
  program.  At the flagship's 26 ms/step this op is ~1% — a perfect
  kernel saving half of it would move end-to-end by <0.6%.

So the fused-XLA path IS the production kernel; `channel_affine` keeps
the math shared with tests and any future Pallas retry.  The real win
shipped here is the contract: uint8 in HBM + tokens straight into the
patch-embed GEMM (models/clip.py VisionTower `tokens=` path) with no
f32 frame tensor ever materialized.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .preprocess import CLIP_MEAN, CLIP_STD, patchify


def channel_affine(mean: Sequence[float] = CLIP_MEAN,
                   std: Sequence[float] = CLIP_STD,
                   patch: int = 32, channels: int = 3,
                   max_value: float = 255.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token-column scale/shift so that
    token * scale + shift == ((u8 / max) - mean) / std, tiled to the
    (p, p, C) row-major token layout."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale_c = 1.0 / (max_value * std)
    shift_c = -mean / std
    reps = patch * patch
    return (np.tile(scale_c, reps).astype(np.float32),
            np.tile(shift_c, reps).astype(np.float32))


def u8_to_patches(frames_u8: jnp.ndarray, patch: int = 32,
                  mean: Sequence[float] = CLIP_MEAN,
                  std: Sequence[float] = CLIP_STD,
                  out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, H, W, C) uint8 -> (N, (H/p)*(W/p), p*p*C) normalized tokens.

    Token order is (p, p, C) row-major, so
    `tokens @ conv_kernel.reshape(-1, width)` equals the strided
    patch-embed conv exactly.
    """
    c = frames_u8.shape[-1]
    scale, shift = channel_affine(mean, std, patch, c)
    # affine in the output dtype: u8 values are exact in bf16 and the
    # conv path rounds its inputs to bf16 anyway; measured +6% step
    # throughput vs an f32 intermediate (docs/PERF.md)
    compute = jnp.float32 if out_dtype == jnp.float32 else out_dtype
    toks = patchify(frames_u8, patch).astype(compute)
    return (toks * jnp.asarray(scale, compute)
            + jnp.asarray(shift, compute)).astype(out_dtype)
