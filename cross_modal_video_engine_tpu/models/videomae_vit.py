"""VideoMAE ViT backbone — faithful to the finetuned-checkpoint contract.

The tubelet mode of models/timesformer.py is the TPU-first joint-attention
tower; THIS module reproduces the reference's VideoMAE
(MCT/mmaction/models/backbones/videomae.py) exactly so its public
checkpoints import 1:1:

* 3D tubelet patch embed (Conv3d tubelet x p x p), NO cls token;
* fixed sinusoidal position table (videomae.py:151-163 — not a param,
  recomputed, so checkpoints without `pos_embed` load);
* blocks: pre-LN, attention with a bias-less fused qkv weight plus
  SEPARATE learnable q_bias / v_bias (k bias pinned to zero,
  videomae.py:58-76), optional layer-scale gamma_1/gamma_2
  (videomae.py:109-121);
* mean pooling over tokens + fc_norm head input (use_mean_pooling=True,
  videomae.py:219-220).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import BACKBONES


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """videomae.py:151-163: the classic transformer sinusoid table."""
    pos = np.arange(n_position)[:, None]
    i = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (i // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


@dataclasses.dataclass(frozen=True)
class VideoMAEConfig:
    num_frames: int = 16
    img_size: int = 224
    patch_size: int = 16
    tubelet_size: int = 2
    embed_dims: int = 768
    num_heads: int = 12
    num_layers: int = 12
    mlp_ratio: float = 4.0
    init_values: float = 0.0          # >0 enables layer-scale gammas
    dtype: str = "float32"

    def jdtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def num_patches(self) -> int:
        return ((self.img_size // self.patch_size) ** 2
                * (self.num_frames // self.tubelet_size))


class _MAEAttention(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        d = self.dim
        qkv_w = self.param("qkv_weight", nn.initializers.normal(0.02),
                           (d, 3 * d))
        q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = x @ qkv_w.astype(self.dtype) + bias.astype(self.dtype)
        B, N, _ = qkv.shape
        h = self.heads
        qkv = qkv.reshape(B, N, 3, h, d // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (d // h) ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class _MAEBlock(nn.Module):
    cfg: VideoMAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.jdtype()
        d = cfg.embed_dims

        def ln(name):
            return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=name)

        if cfg.init_values > 0:
            g1 = self.param("gamma_1", nn.initializers.constant(
                cfg.init_values), (d,))
            g2 = self.param("gamma_2", nn.initializers.constant(
                cfg.init_values), (d,))
        else:
            g1 = g2 = None

        a = _MAEAttention(d, cfg.num_heads, dt, name="attn")(
            ln("norm1")(x).astype(dt))
        if g1 is not None:
            a = g1.astype(a.dtype) * a
        x = x + a
        m = nn.Dense(int(d * cfg.mlp_ratio), dtype=dt, name="fc1")(
            ln("norm2")(x.astype(jnp.float32)).astype(dt))
        m = nn.Dense(d, dtype=dt, name="fc2")(nn.gelu(m, approximate=False))
        if g2 is not None:
            m = g2.astype(m.dtype) * m
        return (x + m).astype(dt)


@BACKBONES.register("VideoMAEViT")
class VideoMAEViT(nn.Module):
    cfg: VideoMAEConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False
                 ) -> jnp.ndarray:
        """videos: (B, T, H, W, 3) -> mean-pooled, fc_norm'd feature
        (B, D) — the head input of the finetuned VideoMAE."""
        cfg = self.cfg
        dt = cfg.jdtype()
        x = nn.Conv(cfg.embed_dims,
                    (cfg.tubelet_size, cfg.patch_size, cfg.patch_size),
                    strides=(cfg.tubelet_size, cfg.patch_size,
                             cfg.patch_size),
                    dtype=dt, name="patch_embed")(videos.astype(dt))
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.embed_dims)
        x = x + jnp.asarray(sinusoid_table(cfg.num_patches,
                                           cfg.embed_dims), dt)
        for i in range(cfg.num_layers):
            x = _MAEBlock(cfg, name=f"block_{i}")(x)
        pooled = jnp.mean(x.astype(jnp.float32), axis=1)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            name="fc_norm")(pooled)


def videomae_config_from_sd(sd: dict, num_frames: int = 16,
                            img_size: int = 224,
                            num_heads: int | None = None) -> dict:
    """Infer VideoMAEConfig kwargs from a checkpoint's shapes.

    num_heads cannot be read from the tensor shapes; it defaults to the
    ViT convention embed_dims // 64 (S:384/6, B:768/12, L:1024/16) and
    can be overridden for non-standard towers.  mmaction-layout
    checkpoints (keys under `backbone.`) are auto-detected."""
    p = ("backbone." if ("patch_embed.proj.weight" not in sd
                         and "backbone.patch_embed.proj.weight" in sd)
         else "")
    pe = sd[p + "patch_embed.proj.weight"]          # (D, 3, t, p, p)
    n_layers = 0
    while f"{p}blocks.{n_layers}.attn.qkv.weight" in sd:
        n_layers += 1
    embed_dims = int(pe.shape[0])
    if num_heads is None:
        num_heads = max(1, embed_dims // 64)
    return dict(
        num_frames=num_frames, img_size=img_size,
        patch_size=int(pe.shape[-1]), tubelet_size=int(pe.shape[2]),
        embed_dims=embed_dims, num_layers=n_layers,
        num_heads=num_heads,
        init_values=(0.1 if "blocks.0.gamma_1" in sd else 0.0),
    )
