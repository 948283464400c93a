"""Composed-retrieval fusion head ("Combiner").

TPU rebuild of MultiFusion/src/combiner.py:81-180 with the same dataflow:

  * text & frame-mean video high-features projected, concatenated, fused by
    `combiner_layer`;
  * a sigmoid `dynamic_scalar` convexly mixes raw text vs video features;
  * a cross-attention block (query = projected text, key/value = projected
    middle tokens over frames x grid) whose output adds `mean(values) +
    attn` then an MLP residual (combiner.py:38-43);
  * output = output_layer(fused) + a*text + (1-a)*video + attn_branch,
    L2-normalized (combiner.py:174-180);
  * logits = 100 * pred @ target.T with targets frame-meaned + normalized
    (`time_process`, combiner.py:121-143).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip import LayerNormF32, MHA, quick_gelu
from ..ops.similarity import l2norm


@dataclasses.dataclass(frozen=True)
class CombinerConfig:
    clip_feature_dim: int = 640
    projection_dim: int = 2560
    hidden_dim: int = 5120
    n_heads: int = 8
    logit_scale: float = 100.0
    dropout: float = 0.5
    # how `m_remained` mixes the middle tokens:
    #   'dense'   — per-token Dense over channels (this framework's clean
    #               formulation; what new training runs use);
    #   'conv4x4' — bit-exact replica of the reference checkpoint contract
    #               (combiner.py:111,165): torch reshapes the (L, D) block
    #               row-major into (L*D/16, 4, 4) "channels x spatial" and
    #               runs a 1x1 Conv2d — i.e. a Dense over groups of 16
    #               consecutive (token, channel) elements.  Required to run
    #               combiner_arithmetic.pt weights (needs L*D % 16 == 0 and
    #               D == L*D/16, i.e. L == 16).
    middle_mix: str = "dense"


class CrossAttentionBlock(nn.Module):
    """q: (B, 1, D); kv: (B, S, D) -> (B, D). Mirrors combiner.py:19-43:
    out = mean(v) + attn; out = out + mlp(ln_2(out))."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, q, kv):
        ln1 = LayerNormF32(name="ln_1")
        attn = MHA(self.width, self.heads, name="attn")(ln1(q), kv=ln1(kv))
        x = jnp.mean(kv, axis=1) + attn[:, 0, :]
        h = LayerNormF32(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="c_proj")(h)
        return x + h


class Combiner(nn.Module):
    cfg: CombinerConfig

    @nn.compact
    def combine_features(self, image_features, text_features,
                         *, train: bool = False):
        """image_features: (high (B, F, D), middle (B, F, L, D));
        text_features: (B, D).  Returns normalized predicted features (B, D).
        """
        cfg = self.cfg
        high, middle = image_features
        B, F, L, D = middle.shape
        drop = lambda name: nn.Dropout(cfg.dropout, deterministic=not train,
                                       name=name)

        # middle-token mixing (m_remained, combiner.py:111)
        if cfg.middle_mix == "conv4x4":
            # reference-exact: torch views (L, D) row-major as
            # (C=L*D/16, 4, 4) and applies a 1x1 conv; equivalently a
            # Dense over the C axis of a (B*F, C, 16) view.
            C = L * D // 16
            kernel = self.param("m_remained_kernel",
                                nn.initializers.lecun_normal(), (C, C))
            bias = self.param("m_remained_bias", nn.initializers.zeros, (C,))
            xc = middle.reshape(B * F, C, 16)
            mixed = jnp.einsum("bcs,co->bos", xc, kernel,
                               preferred_element_type=jnp.float32)
            mixed = (mixed + bias[None, :, None]).reshape(B, F, L, D)
            p_s_m = drop("dropout7")(nn.relu(mixed.astype(middle.dtype)))
        else:
            p_s_m = drop("dropout7")(nn.relu(
                nn.Dense(D, name="m_remained")(middle)))
        p_r_m = drop("dropout6")(nn.relu(
            nn.Dense(D, name="m_residual")(text_features)))

        based = CrossAttentionBlock(D, cfg.n_heads, name="self_attn_1")(
            p_r_m[:, None, :], p_s_m.reshape(B, F * L, D))
        based = drop("dropout4")(nn.relu(based))

        video_high = jnp.mean(high, axis=1)         # time_process
        text_proj = drop("dropout1")(nn.relu(
            nn.Dense(cfg.projection_dim, name="text_projection_layer")(
                text_features)))
        image_proj = drop("dropout2")(nn.relu(
            nn.Dense(cfg.projection_dim, name="image_projection_layer")(
                video_high)))

        raw = jnp.concatenate([image_proj, text_proj], axis=-1)
        combined = drop("dropout3")(nn.relu(
            nn.Dense(cfg.hidden_dim, name="combiner_layer")(raw)))

        ds = nn.Dense(cfg.hidden_dim, name="dynamic_scalar_fc1")(raw)
        ds = nn.Dropout(cfg.dropout, deterministic=not train,
                        name="dynamic_scalar_drop")(nn.relu(ds))
        dynamic_scalar = jax.nn.sigmoid(
            nn.Dense(1, name="dynamic_scalar_fc2")(ds))

        output = (nn.Dense(cfg.clip_feature_dim, name="output_layer")(combined)
                  + dynamic_scalar * text_features
                  + (1.0 - dynamic_scalar) * video_high
                  + based)
        return l2norm(output)

    def time_process(self, fea: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(fea, axis=1)

    def __call__(self, image_features, text_features, target_features,
                 *, train: bool = False):
        """target_features: (high (B, F, D), ...) of the target videos.
        Returns (B, B) scaled logits (combiner.py:121-138)."""
        pred = self.combine_features(image_features, text_features, train=train)
        target = self.time_process(target_features[0])
        target = l2norm(target)
        return self.cfg.logit_scale * jnp.dot(
            pred, target.T, preferred_element_type=jnp.float32)
