"""MViT: Multiscale Vision Transformer (pooling attention).

TPU rebuild of MCT/mmaction/models/backbones/mvit.py (MViTv2 flavor):
tubelet patch embed, transformer blocks whose attention POOLS queries and
keys/values with strided depthwise convs — resolution shrinks and channels
grow across 4 scales — plus the v2 residual-pooling connection.

Pooling is expressed as strided depthwise 3D convs on the (T, H, W) token
grid; everything reshapes statically so XLA tiles the attention matmuls
per scale.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import BACKBONES


@dataclasses.dataclass(frozen=True)
class MViTConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (1, 2, 11, 2)      # MViT-S-ish
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    # spatial stride of the q-pooling at each stage TRANSITION (first block
    # of stages 1..): resolution halves, channels double
    mlp_ratio: float = 4.0


def _pooled_grid(grid: Tuple[int, int, int],
                 stride: Tuple[int, int, int]) -> Tuple[int, int, int]:
    """Output grid of a kernel-3/pad-1 pooling at `stride`:
    floor((g - 1) / s) + 1 per axis."""
    return tuple((g - 1) // s + 1 for g, s in zip(grid, stride))


def _pool_skip(x: jnp.ndarray, grid: Tuple[int, int, int],
               stride: Tuple[int, int, int]) -> Tuple[jnp.ndarray, Tuple]:
    """Residual-path pooling: parameterless kernel-3/pad-1 max pool
    (the official MViT pool_skip), matching the conv pools' grid."""
    if all(s == 1 for s in stride):
        return x, grid
    B, N, C = x.shape
    T, H, W = grid
    x = x.reshape(B, T, H, W, C)
    x = nn.max_pool(x, window_shape=(3, 3, 3), strides=stride,
                    padding=((1, 1), (1, 1), (1, 1)))
    return x.reshape(B, -1, C), _pooled_grid(grid, stride)


class _PoolConv(nn.Module):
    """MViTv2 token pooling: strided DEPTHWISE 3x3x3 conv + LayerNorm
    on the (T, H, W) grid — learnable, unlike a max pool."""

    stride: Tuple[int, int, int]
    grid: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x):
        if all(s == 1 for s in self.stride):
            return x, self.grid
        B, N, C = x.shape
        T, H, W = self.grid
        x = x.reshape(B, T, H, W, C)
        x = nn.Conv(C, (3, 3, 3), strides=self.stride,
                    padding=((1, 1), (1, 1), (1, 1)),
                    feature_group_count=C, use_bias=False,
                    name="conv")(x)
        x = nn.LayerNorm(name="norm")(x)
        return x.reshape(B, -1, C), _pooled_grid(self.grid, self.stride)


class PoolingAttention(nn.Module):
    dim_out: int
    heads: int
    grid: Tuple[int, int, int]
    q_stride: Tuple[int, int, int] = (1, 1, 1)
    kv_stride: Tuple[int, int, int] = (1, 2, 2)

    @nn.compact
    def __call__(self, x):
        """x: (B, N, C) on self.grid -> (B, N_q, dim_out), new q grid."""
        H = self.heads
        hd = self.dim_out // H
        q = nn.Dense(self.dim_out, name="q")(x)
        k = nn.Dense(self.dim_out, name="k")(x)
        v = nn.Dense(self.dim_out, name="v")(x)
        q, q_grid = _PoolConv(self.q_stride, self.grid, name="pool_q")(q)
        k, _ = _PoolConv(self.kv_stride, self.grid, name="pool_k")(k)
        v, _ = _PoolConv(self.kv_stride, self.grid, name="pool_v")(v)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        qh = q.reshape(B, Nq, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, Nk, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Nk, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        w = jax.nn.softmax(logits, -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, vh,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(B, Nq, self.dim_out)
        # MViTv2 residual pooling: add the pooled queries back
        o = o + q
        return nn.Dense(self.dim_out, name="proj")(o), q_grid


class MViTBlock(nn.Module):
    dim_out: int
    heads: int
    grid: Tuple[int, int, int]
    q_stride: Tuple[int, int, int] = (1, 1, 1)
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        attn, new_grid = PoolingAttention(
            self.dim_out, self.heads, self.grid, self.q_stride,
            name="attn")(h)
        # shortcut: project channels / pool tokens to match
        sc = x
        if sc.shape[-1] != self.dim_out:
            sc = nn.Dense(self.dim_out, name="shortcut_proj")(sc)
        sc, _ = _pool_skip(sc, self.grid, self.q_stride)
        x = sc + attn
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(self.dim_out * self.mlp_ratio), name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim_out, name="fc2")(h)
        return x + h, new_grid


@BACKBONES.register("MViT")
class MViT(nn.Module):
    cfg: MViTConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        """(B, T, H, W, 3) -> pooled feature (B, embed_dim * 2^(stages-1))."""
        cfg = self.cfg
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, p, strides=p, name="patch_embed")(videos)
        B, T, Hh, Ww, C = x.shape
        grid = (T, Hh, Ww)
        x = x.reshape(B, -1, C)
        dim = cfg.embed_dim
        for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for j in range(depth):
                first = (j == 0 and i > 0)
                dim_out = dim * 2 if first else dim
                q_stride = (1, 2, 2) if first else (1, 1, 1)
                x, grid = MViTBlock(dim_out, heads, grid, q_stride,
                                    cfg.mlp_ratio,
                                    name=f"stage{i}_block{j}")(x)
                dim = dim_out
        x = nn.LayerNorm(name="norm")(x)
        return jnp.mean(x, axis=1)
