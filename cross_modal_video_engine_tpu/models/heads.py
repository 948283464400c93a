"""Classification heads (mmaction heads family).

I3DHead / SlowFastHead / TSNHead / X3DHead equivalents: the backbones here
already global-average-pool to (B, C), so every head is dropout + Dense
with the family's init std — matching the mmaction math after its
AdaptiveAvgPool3d.  `TSNHead` adds the segment consensus (mean over
segments) of Recognizer2D.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import HEADS


class _PooledHead(nn.Module):
    num_classes: int
    dropout_ratio: float = 0.5
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(self.init_std),
            name="fc_cls")(x)


@HEADS.register("I3DHead")
class I3DHead(_PooledHead):
    pass


@HEADS.register("SlowFastHead")
class SlowFastHead(_PooledHead):
    dropout_ratio: float = 0.8


@HEADS.register("X3DHead")
class X3DHead(nn.Module):
    num_classes: int
    mid_channels: int = 2048
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.relu(nn.Dense(self.mid_channels, name="fc1")(x))
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        name="fc2")(x)


@HEADS.register("TRNHead")
class TRNHead(nn.Module):
    """Temporal Relation Network head (reference heads/trn_head.py:13-210).

    Frame features are projected per-frame to `hidden_dim` (the reference's
    fc_cls), then relation modules reason over frame tuples:
      * 'TRN' — one relation over all segments;
      * 'TRNMultiScale' — for every scale s in [num_segments..2], an MLP
        over s-frame tuples; at most `max_subsample` tuples per scale,
        chosen uniformly at random during training (pass
        rngs={'relation': key}) and evenly spaced at eval so inference is
        deterministic/jittable.
    """

    num_classes: int
    num_segments: int = 8
    hidden_dim: int = 256
    bottleneck_dim: int = 256
    dropout_ratio: float = 0.8
    relation_type: str = "TRNMultiScale"
    max_subsample: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        import itertools
        import numpy as np
        import jax

        if x.ndim == 2:
            x = x.reshape(-1, self.num_segments, x.shape[-1])
        B = x.shape[0]
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        x = nn.Dense(self.hidden_dim,
                     kernel_init=nn.initializers.normal(0.001),
                     name="fc_cls")(x)                 # (B, S, hidden)

        def relation_mlp(feats, scale, name):
            # Sequential(ReLU, Linear(scale*hidden, bottleneck), ReLU,
            # Linear(bottleneck, classes)) — trn_head.py:77-83
            h = nn.relu(feats.reshape(feats.shape[:-2] + (-1,)))
            h = nn.relu(nn.Dense(self.bottleneck_dim,
                                 name=f"{name}_fc1")(h))
            return nn.Dense(self.num_classes, name=f"{name}_fc2")(h)

        if self.relation_type == "TRN":
            return relation_mlp(x, self.num_segments, "relation")

        scales = list(range(self.num_segments, 1, -1))
        # full-scale relation (always the single all-frames tuple)
        out = relation_mlp(x, scales[0], f"fusion_s{scales[0]}")
        for scale in scales[1:]:
            combos = np.asarray(
                list(itertools.combinations(range(self.num_segments),
                                            scale)), np.int32)
            k = min(self.max_subsample, len(combos))
            if train and self.has_rng("relation"):
                key = self.make_rng("relation")
                pick = jax.random.choice(key, len(combos), (k,),
                                         replace=False)
            else:
                pick = jnp.asarray(
                    np.linspace(0, len(combos) - 1, k).round().astype(
                        np.int32))
            sel = jnp.asarray(combos)[pick]            # (k, scale)
            feats = x[:, sel]                          # (B, k, scale, h)
            rel = relation_mlp(feats, scale, f"fusion_s{scale}")
            out = out + rel.sum(axis=1)
        return out


@HEADS.register("TSNHead")
class TSNHead(nn.Module):
    """Segment consensus head for 2D recognizers: (B, num_segs, C) frame
    features -> mean consensus -> classifier."""

    num_classes: int
    dropout_ratio: float = 0.4
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:
            x = jnp.mean(x, axis=1)                    # segment consensus
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(self.init_std),
            name="fc_cls")(x)
