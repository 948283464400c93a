"""Video Swin Transformer (3D shifted-window attention).

TPU rebuild of MCT/mmaction/models/backbones/swin_transformer.py: tubelet
patch embed, stages of window attention with alternating cyclic shifts,
learned relative-position bias over (2wd-1)(2wh-1)(2ww-1) offsets, and
patch merging (2x2 spatial concat + linear) between stages.

Window partition/reverse are pure reshapes/transposes; the shift is
jnp.roll; the shifted-window attention mask is precomputed per stage from
the standard region-id construction — everything static-shape so XLA
compiles one program per input size.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import BACKBONES

NEG = -1e9


@dataclasses.dataclass(frozen=True)
class Swin3DConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    mlp_ratio: float = 4.0
    drop_path_max: float = 0.1


def window_partition(x: jnp.ndarray, w: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, wd*wh*ww, C)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // w[0], w[0], H // w[1], w[1], W // w[2], w[2], C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, w[0] * w[1] * w[2], C)


def window_reverse(x: jnp.ndarray, w: Tuple[int, int, int],
                   B: int, D: int, H: int, W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, D // w[0], H // w[1], W // w[2], w[0], w[1], w[2], C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, C)


def relative_position_index(w: Tuple[int, int, int]) -> np.ndarray:
    """(N, N) int index into the (2wd-1)(2wh-1)(2ww-1) bias table."""
    coords = np.stack(np.meshgrid(np.arange(w[0]), np.arange(w[1]),
                                  np.arange(w[2]), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]           # (3, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w[0] - 1
    rel[:, :, 1] += w[1] - 1
    rel[:, :, 2] += w[2] - 1
    rel[:, :, 0] *= (2 * w[1] - 1) * (2 * w[2] - 1)
    rel[:, :, 1] *= (2 * w[2] - 1)
    return rel.sum(-1)


def shifted_window_mask(dims: Tuple[int, int, int],
                        w: Tuple[int, int, int],
                        shift: Tuple[int, int, int]) -> np.ndarray:
    """(nW, N, N) additive mask for shifted windows (region-id trick)."""
    D, H, W = dims
    img = np.zeros((1, D, H, W, 1), np.int32)
    cnt = 0
    for d in (slice(0, -w[0]), slice(-w[0], -shift[0] or None),
              slice(-shift[0] or -w[0], None)):
        for h in (slice(0, -w[1]), slice(-w[1], -shift[1] or None),
                  slice(-shift[1] or -w[1], None)):
            for ww_ in (slice(0, -w[2]), slice(-w[2], -shift[2] or None),
                        slice(-shift[2] or -w[2], None)):
                img[:, d, h, ww_, :] = cnt
                cnt += 1
    # pure-numpy window partition: this runs at TRACE time and must stay a
    # compile-time constant (jnp here would leak tracers under jit)
    x = img.reshape(1, D // w[0], w[0], H // w[1], w[1], W // w[2], w[2], 1)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    win = x.reshape(-1, w[0] * w[1] * w[2])             # (nW, N)
    mask = (win[:, None, :] != win[:, :, None]).astype(np.float32) * NEG
    return mask


class WindowAttention3D(nn.Module):
    dim: int
    heads: int
    window: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        """x: (nB, N, C); mask: (nW, N, N) with nB = B*nW."""
        N = x.shape[1]
        H = self.heads
        hd = self.dim // H
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(-1, N, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(-1, N, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(-1, N, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        w = self.window
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * w[0] - 1) * (2 * w[1] - 1) * (2 * w[2] - 1), H))
        idx = relative_position_index(w).reshape(-1)
        bias = table[idx].reshape(N, N, H).transpose(2, 0, 1)
        logits = logits + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            logits = logits.reshape(-1, nW, H, N, N) + \
                mask[None, :, None, :, :]
            logits = logits.reshape(-1, H, N, N)
        attn = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(-1, N, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock3D(nn.Module):
    dim: int
    heads: int
    window: Tuple[int, int, int]
    shift: Tuple[int, int, int]
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        """x: (B, D, H, W, C); dims must be window-padded already."""
        B, D, H, W, C = x.shape
        win = tuple(min(w, s) for w, s in zip(self.window, (D, H, W)))
        shift = tuple(0 if ws >= s else sh
                      for ws, s, sh in zip(self.window, (D, H, W),
                                           self.shift))
        shortcut = x
        h = nn.LayerNorm(name="norm1")(x)
        if any(shift):
            h = jnp.roll(h, (-shift[0], -shift[1], -shift[2]), (1, 2, 3))
            mask = jnp.asarray(shifted_window_mask((D, H, W), win, shift))
        else:
            mask = None
        hw = window_partition(h, win)
        hw = WindowAttention3D(C, self.heads, win, name="attn")(hw, mask)
        h = window_reverse(hw, win, B, D, H, W)
        if any(shift):
            h = jnp.roll(h, shift, (1, 2, 3))
        x = shortcut + h
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        """(B, D, H, W, C) -> (B, D, ceil(H/2), ceil(W/2), 2C).  Odd
        H/W pad by one row/col first (reference swin_transformer.py
        :298-301 F.pad), so odd stage resolutions merge instead of
        crashing the strided concat."""
        H, W = x.shape[2], x.shape[3]
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2),
                            (0, 0)))
        x = jnp.concatenate([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                             x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], -1)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


@BACKBONES.register("Swin3D")
class Swin3D(nn.Module):
    cfg: Swin3DConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        """(B, T, H, W, 3) -> pooled feature (B, 8*embed_dim)."""
        cfg = self.cfg
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, p, strides=p, name="patch_embed")(videos)
        x = nn.LayerNorm(name="patch_norm")(x)
        for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            B, D, H, W, C = x.shape
            win = tuple(min(w, s) for w, s in zip(cfg.window_size,
                                                  (D, H, W)))
            pads = [(0, 0)] + [(0, (-s) % w)
                               for s, w in zip((D, H, W), win)] + [(0, 0)]
            need_pad = any(p[1] for p in pads)
            for j in range(depth):
                # pad to window multiples PER BLOCK and strip after it
                # (reference forward_part1/F.pad): pad positions must be
                # fresh zeros in every block, or their previous-block
                # activations leak into the boundary windows
                if need_pad:
                    x = jnp.pad(x, pads)
                shift = (tuple(w // 2 for w in win) if j % 2 else (0, 0, 0))
                x = SwinBlock3D(C, heads, win, shift, cfg.mlp_ratio,
                                name=f"stage{i}_block{j}")(x)
                if need_pad:
                    x = x[:, :D, :H, :W]
            if i < len(cfg.depths) - 1:
                x = PatchMerging(C, name=f"merge{i}")(x)
        x = nn.LayerNorm(name="norm")(x)
        return jnp.mean(x, axis=(1, 2, 3))
