"""TimeSformer video backbone (divided / joint / space-only attention).

TPU rebuild of MCT/mmaction/models/backbones/timesformer.py:67-346 and the
divided attention modules (mmaction/models/common/transformer.py:13-178):

* token layout matches the reference exactly: one CLS token + patch-major
  (p t) flattened patch tokens, spatial pos-embed added per frame, temporal
  embed added per patch (timesformer.py:258-276);
* DividedTemporalAttention: LN -> MHA over time per patch -> proj ->
  zero-init temporal_fc -> residual on patch tokens only
  (transformer.py:63-87);
* DividedSpatialAttention: CLS broadcast per frame, LN -> MHA over patches
  per frame -> frame-mean of CLS response -> residual
  (transformer.py:141-177);
* FFNWithNorm: pre-norm MLP with GELU.

All reshapes are pure transposes on (B, P, T, D) so XLA keeps everything on
the MXU; stochastic depth follows the reference linspace(0, 0.1) schedule.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .clip import MHA


@dataclasses.dataclass(frozen=True)
class TimeSformerConfig:
    num_frames: int = 8
    img_size: int = 224
    patch_size: int = 16
    embed_dims: int = 768
    num_heads: int = 12
    num_layers: int = 12
    attention_type: str = "divided_space_time"  # | 'joint_space_time' | 'space_only'
    dropout_ratio: float = 0.0
    drop_path_max: float = 0.1
    dtype: str = "float32"
    # tubelet_size > 1 + joint_space_time = VideoMAE-style ViT: the patch
    # embed becomes a 3D conv over (tubelet, p, p) and the temporal axis
    # shrinks to num_frames // tubelet_size (ref backbones/videomae.py).
    tubelet_size: int = 1
    # joint attention over long token streams (1 + P*T >= ~1024) can route
    # through the Pallas flash kernel
    use_flash_attention: bool = False
    # rematerialize blocks in the backward pass (jax.checkpoint):
    # bigger train batches at ~1/3 extra FLOPs
    remat: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def time_tokens(self) -> int:
        return self.num_frames // self.tubelet_size

    def jdtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class LN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32)).astype(x.dtype)


class DividedSTBlock(nn.Module):
    cfg: TimeSformerConfig
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, 1 + P*T, D), patch-major (p t) token order.
        (`train` is positional-or-keyword so cfg.remat can mark it a
        static argument for nn.remat.)"""
        cfg = self.cfg
        B = x.shape[0]
        P, T, D = cfg.num_patches, cfg.time_tokens, cfg.embed_dims
        dp = DropPath(self.drop_path, name="drop_path")

        # --- temporal attention over frames, per patch ---------------------
        cls0 = x[:, :1, :]
        patches = x[:, 1:, :]                           # (B, P*T, D)
        qt = patches.reshape(B * P, T, D)
        qt = LN(name="temporal_norm")(qt)
        rt = MHA(D, cfg.num_heads, qt.dtype, name="temporal_attn")(qt)
        rt = dp(rt.reshape(B, P * T, D), train=train)
        rt = nn.Dense(D, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="temporal_fc")(rt)
        patches = patches + rt
        # the spatial block's residual includes the temporal update
        # (ref transformer.py:84-86: new_query = cat(cls, identity + res_t))
        x = jnp.concatenate([cls0, patches], axis=1)

        # --- spatial attention over patches, per frame ---------------------
        # (B, P*T, D) p-major -> (B*T, P, D)
        ps = patches.reshape(B, P, T, D).transpose(0, 2, 1, 3).reshape(B * T, P, D)
        cls_rep = jnp.broadcast_to(cls0, (B, T, D)).reshape(B * T, 1, D)
        qs = jnp.concatenate([cls_rep, ps], axis=1)     # (B*T, P+1, D)
        qs = LN(name="spatial_norm")(qs)
        rs = MHA(D, cfg.num_heads, qs.dtype, name="spatial_attn")(qs)
        rs = dp(rs, train=train)
        cls_res = jnp.mean(rs[:, 0, :].reshape(B, T, D), axis=1, keepdims=True)
        patch_res = rs[:, 1:, :].reshape(B, T, P, D).transpose(0, 2, 1, 3) \
            .reshape(B, P * T, D)
        x = x + jnp.concatenate([cls_res, patch_res], axis=1)

        # --- FFN with pre-norm ---------------------------------------------
        h = LN(name="ffn_norm")(x)
        h = nn.Dense(D * 4, name="ffn_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(D, name="ffn_fc2")(h)
        return x + dp(h, train=train)


class JointBlock(nn.Module):
    cfg: TimeSformerConfig
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dp = DropPath(self.drop_path, name="drop_path")
        h = LN(name="norm1")(x)
        x = x + dp(MHA(cfg.embed_dims, cfg.num_heads, h.dtype,
                       use_flash=cfg.use_flash_attention, name="attn")(h),
                   train=train)
        h = LN(name="norm2")(x)
        h = nn.Dense(cfg.embed_dims * 4, name="ffn_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.embed_dims, name="ffn_fc2")(h)
        return x + dp(h, train=train)


class TimeSformer(nn.Module):
    cfg: TimeSformerConfig

    def setup(self):
        cfg = self.cfg
        if cfg.tubelet_size > 1:
            self.patch_embed = nn.Conv(
                cfg.embed_dims,
                (cfg.tubelet_size, cfg.patch_size, cfg.patch_size),
                strides=(cfg.tubelet_size, cfg.patch_size, cfg.patch_size),
                name="patch_embed")
        else:
            self.patch_embed = nn.Conv(
                cfg.embed_dims, (cfg.patch_size, cfg.patch_size),
                strides=(cfg.patch_size, cfg.patch_size), name="patch_embed")
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.embed_dims))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 1, cfg.embed_dims))
        self.drop_after_pos = nn.Dropout(cfg.dropout_ratio)
        if cfg.attention_type != "space_only":
            self.time_embed = self.param(
                "time_embed", nn.initializers.truncated_normal(0.02),
                (1, cfg.time_tokens, cfg.embed_dims))
            self.drop_after_time = nn.Dropout(cfg.dropout_ratio)
        dpr = np.linspace(0, cfg.drop_path_max, cfg.num_layers)
        block_cls = (DividedSTBlock if cfg.attention_type ==
                     "divided_space_time" else JointBlock)
        if cfg.remat:
            # rematerialize each block's activations on the backward
            # pass — trades ~33% more FLOPs for O(layers) less HBM, so
            # training batches grow past the activation wall; `train`
            # (arg index 2 incl. self) stays a static python bool
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        self.blocks = [block_cls(cfg, float(dpr[i]), name=f"block_{i}")
                       for i in range(cfg.num_layers)]
        self.final_norm = LN(name="norm")

    def _pool(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.attention_type == "space_only":
            # reference order (timesformer.py forward): mean over time
            # FIRST, then the final norm — LayerNorm(mean) != mean(LN)
            x = x.reshape(-1, cfg.time_tokens, cfg.num_patches + 1,
                          cfg.embed_dims).mean(axis=1)
        x = self.final_norm(x)
        return x, x[:, 0].astype(jnp.float32)

    def embed_tokens(self, videos: jnp.ndarray, *, train: bool = False):
        """Patch-embed + cls/pos/time embeddings -> the layer-0 input
        token sequence."""
        cfg = self.cfg
        dt = cfg.jdtype()
        B, T_in = videos.shape[0], videos.shape[1]
        assert T_in == cfg.num_frames, (T_in, cfg.num_frames)
        P, D = cfg.num_patches, cfg.embed_dims
        T = cfg.time_tokens
        if cfg.tubelet_size > 1:
            x = self.patch_embed(videos.astype(dt))     # (B, T', g, g, D)
            x = x.reshape(B * T, P, D)
        else:
            flat = videos.reshape((B * T_in,) + videos.shape[2:]).astype(dt)
            x = self.patch_embed(flat).reshape(B * T, P, D)
        x = jnp.concatenate(
            [jnp.broadcast_to(self.cls_token.astype(dt), (B * T, 1, D)), x],
            axis=1)
        x = x + self.pos_embed.astype(dt)
        x = self.drop_after_pos(x, deterministic=not train)
        if cfg.attention_type != "space_only":
            cls_tokens = x.reshape(B, T, P + 1, D)[:, 0, :1, :]
            patches = x[:, 1:, :].reshape(B, T, P, D).transpose(0, 2, 1, 3)
            patches = patches + self.time_embed.astype(dt)
            patches = self.drop_after_time(patches, deterministic=not train)
            x = jnp.concatenate(
                [cls_tokens, patches.reshape(B, P * T, D)], axis=1)
        return x

    def __call__(self, videos: jnp.ndarray, *, train: bool = False,
                 return_tokens: bool = False,
                 capture_layers: Tuple[int, ...] = ()):
        """videos: (B, T, H, W, 3) -> cls feature (B, D), optionally the full
        token sequence.  `capture_layers` additionally returns the token
        sequences after those block indices (the OutputHook equivalent,
        ref core/hooks/output.py:8-123) as a dict {layer: (B, L, D)}."""
        x = self.embed_tokens(videos, train=train)
        captured = {}
        for i, block in enumerate(self.blocks):
            x = block(x, train)   # positional: remat static_argnums
            if i in capture_layers:
                captured[i] = x.astype(jnp.float32)
        x, cls_feat = self._pool(x)
        if capture_layers:
            if return_tokens:
                return cls_feat, x.astype(jnp.float32), captured
            return cls_feat, captured
        if return_tokens:
            return cls_feat, x.astype(jnp.float32)
        return cls_feat

    def forward_from(self, tokens: jnp.ndarray, layer: int, *,
                     train: bool = False) -> jnp.ndarray:
        """Continue the forward pass from the token sequence AFTER block
        `layer` (exclusive) to the final cls feature — the functional
        replacement for torch backward hooks (utils/get_grads.py:16-146):
        grads w.r.t. a captured activation are jax.grad through this."""
        x = tokens.astype(self.cfg.jdtype())
        for i, block in enumerate(self.blocks):
            if i <= layer:
                continue
            x = block(x, train)   # positional: remat static_argnums
        _, cls_feat = self._pool(x)
        return cls_feat
