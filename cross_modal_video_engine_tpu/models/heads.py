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
