"""TPN: Temporal Pyramid Network neck.

TPU rebuild of MCT/mmaction/models/necks/tpn.py (the missing neck of the
inventory): takes the last N backbone stages, aligns them spatially
(SpatialModulation), modulates temporal rates (grouped 3x1x1 conv +
temporal maxpool), fuses a top-down and a bottom-up pyramid (LevelFusion
x2 + pyramid fusion conv), and optionally supervises stage -2 with an
auxiliary classification head (AuxHead, loss weight 0.5).

Layout is channels-last (B, T, H, W, C); temporal up/downsampling uses
nearest resize / strided maxpool, so each configured shape compiles to
one fixed XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


@dataclasses.dataclass(frozen=True)
class TPNConfig:
    in_channels: Tuple[int, ...] = (1024, 2048)
    out_channels: int = 1024
    mid_channels: int = 1024
    fusion_channels: int = 2048
    downsample_scales: Tuple[int, ...] = (8, 8)
    groups: int = 32                  # grouped convs like the reference
    flow_type: str = "cascade"        # | 'parallel'
    aux_num_classes: Optional[int] = None
    aux_loss_weight: float = 0.5


class _TemporalModulation(nn.Module):
    """Grouped 3x1x1 conv + temporal maxpool (tpn.py:259-292)."""

    out_channels: int
    scale: int
    groups: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0),
                                                           (0, 0)),
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        if self.scale > 1:
            x = nn.max_pool(x, (self.scale, 1, 1),
                            strides=(self.scale, 1, 1))
        return x


class _LevelFusion(nn.Module):
    """Per-level grouped 1x1x1 conv+BN+ReLU, concat, 1x1x1 fuse
    (tpn.py:85-143)."""

    mid_channels: int
    out_channels: int
    groups: int

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], *, train: bool = False):
        outs = []
        for i, f in enumerate(feats):
            h = nn.Conv(self.mid_channels, (1, 1, 1),
                        feature_group_count=self.groups, use_bias=False,
                        name=f"down{i}")(f)
            outs.append(nn.relu(_bn(train, f"down_bn{i}")(h)))
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False,
                    name="fusion")(x)
        return nn.relu(_bn(train, "fusion_bn")(x))


class TPN(nn.Module):
    cfg: TPNConfig

    @nn.compact
    def __call__(self, stages: Sequence[jnp.ndarray], *, train: bool = False,
                 target: Optional[jnp.ndarray] = None):
        """stages: the last len(in_channels) backbone stage maps, each
        (B, T_i, H_i, W_i, C_i), coarsest last.  Returns (feature map
        (B, T', H', W', fusion_channels), aux dict with 'loss_aux' when an
        aux head is configured and `target` labels are given)."""
        cfg = self.cfg
        n = len(cfg.in_channels)
        assert len(stages) == n
        aux = {}

        if cfg.aux_num_classes is not None and target is not None:
            # AuxHead on the second-to-last stage (tpn.py:198-256)
            a = stages[-2]
            a = nn.Conv(a.shape[-1] * 2, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                        name="aux_conv")(a)
            a = _bn(train, "aux_bn")(a)
            a = jnp.mean(a, axis=(1, 2, 3))
            a = nn.Dropout(0.5, deterministic=not train,
                           name="aux_drop")(a)
            scores = nn.Dense(cfg.aux_num_classes, name="aux_fc")(a)
            aux["loss_aux"] = cfg.aux_loss_weight * \
                optax.softmax_cross_entropy_with_integer_labels(
                    scores, target).mean()

        # spatial modulation: strided 3x3 convs bring every stage to the
        # last stage's spatial size and channel count (tpn.py:146-196)
        tgt_hw = stages[-1].shape[2:4]
        sm = []
        for i, f in enumerate(stages):
            j = 0
            while f.shape[2] > tgt_hw[0]:
                f = nn.Conv(cfg.in_channels[-1], (1, 3, 3),
                            strides=(1, 2, 2),
                            padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                            name=f"sm{i}_conv{j}")(f)
                f = nn.relu(_bn(train, f"sm{i}_bn{j}")(f))
                j += 1
            sm.append(f)

        # temporal modulation per level
        tm = [
            _TemporalModulation(cfg.out_channels, cfg.downsample_scales[i],
                                cfg.groups, name=f"tm{i}")(sm[i])
            for i in range(n)]

        def match_t(x, t):
            if x.shape[1] == t:
                return x
            if x.shape[1] < t:     # temporal nearest upsample
                return jax.image.resize(
                    x, (x.shape[0], t) + x.shape[2:], "nearest")
            s = x.shape[1] // t    # temporal maxpool downsample
            return nn.max_pool(x, (s, 1, 1), strides=(s, 1, 1))

        # top-down pyramid
        outs = list(tm)
        for i in range(n - 1, 0, -1):
            outs[i - 1] = outs[i - 1] + match_t(outs[i],
                                                outs[i - 1].shape[1])
        top_down = _LevelFusion(cfg.mid_channels, cfg.out_channels,
                                cfg.groups, name="fuse_td")(
            [match_t(o, tm[-1].shape[1]) for o in outs], train=train)

        # bottom-up pyramid
        outs = list(tm) if cfg.flow_type == "parallel" else outs
        for i in range(n - 1):
            outs[i + 1] = outs[i + 1] + match_t(outs[i],
                                                outs[i + 1].shape[1])
        bottom_up = _LevelFusion(cfg.mid_channels, cfg.out_channels,
                                 cfg.groups, name="fuse_bu")(
            [match_t(o, tm[-1].shape[1]) for o in outs], train=train)

        x = jnp.concatenate([top_down, bottom_up], axis=-1)
        x = nn.Conv(cfg.fusion_channels, (1, 1, 1), use_bias=False,
                    name="pyramid_fusion")(x)
        x = _bn(train, "pyramid_bn")(x)
        return x, aux
