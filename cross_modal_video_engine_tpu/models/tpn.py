"""TPN: Temporal Pyramid Network neck.

TPU rebuild of MCT/mmaction/models/necks/tpn.py, structured
parameter-for-parameter with the reference so checkpoints import
(convert_tpn):

* SpatialModulation (tpn.py:146-196): a channel-DOUBLING ladder of
  strided (1,3,3) conv+BN+ReLU per non-top stage.
* TemporalModulation (tpn.py:259-292): grouped (3,1,1) conv (no
  bias/BN/act) + ceil-mode temporal maxpool.
* Upsample hops (nn.Upsample, parameterless; the shipped recipe's
  scale (1,1,1) makes them identity) and DownSample hops with a real
  (3,1,1) conv (no BN/act) + maxpool (tpn.py:17-84).
* Two LevelFusions (grouped 1x1x1 conv+BN+ReLU per level, concat,
  1x1x1 fuse conv+BN+ReLU) + pyramid fusion conv+BN+ReLU
  (tpn.py:85-143, 383-394).
* AuxHead on stage -2 (conv+BN, avgpool, dropout, fc — tpn.py:198-256);
  its params exist whenever `aux_num_classes` is configured (the loss
  is only computed when labels are passed).

Layout is channels-last (B, T, H, W, C); all up/downsampling compiles
to one fixed XLA program per configured shape.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


@dataclasses.dataclass(frozen=True)
class TPNConfig:
    in_channels: Tuple[int, ...] = (1024, 2048)
    out_channels: int = 1024          # temporal-modulation width
    mid_channels: int = 1024          # level-fusion per-level width
    lf_out_channels: int = 2048       # level-fusion output width
    fusion_channels: int = 2048       # pyramid-fusion output width
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
            # ceil_mode=True (reference MaxPool3d): pad the temporal
            # tail with -inf so a non-multiple T keeps its last window
            # instead of dropping the tail frames
            pad = (-x.shape[1]) % self.scale
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)),
                            constant_values=-jnp.inf)
            x = nn.max_pool(x, (self.scale, 1, 1),
                            strides=(self.scale, 1, 1))
        return x


class _LevelFusion(nn.Module):
    """Per-level grouped 1x1x1 conv+BN+ReLU, concat, 1x1x1 fuse conv+
    BN+ReLU (tpn.py:85-143; the recipe's downsample_scales (1,1,1) make
    the per-level pools identity)."""

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

        if cfg.aux_num_classes is not None:
            # AuxHead on the second-to-last stage (tpn.py:198-256);
            # params exist regardless of whether labels are passed
            a = stages[-2]
            a = nn.Conv(a.shape[-1] * 2, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                        name="aux_conv")(a)
            # ConvModule's default act_cfg is ReLU; AuxHead does not
            # override it (tpn.py:198-256), so conv+BN+ReLU
            a = nn.relu(_bn(train, "aux_bn")(a))
            a = jnp.mean(a, axis=(1, 2, 3))
            a = nn.Dropout(0.5, deterministic=not train,
                           name="aux_drop")(a)
            scores = nn.Dense(cfg.aux_num_classes, name="aux_fc")(a)
            if target is not None:
                aux["loss_aux"] = cfg.aux_loss_weight * \
                    optax.softmax_cross_entropy_with_integer_labels(
                        scores, target).mean()

        # spatial modulation: a channel-doubling ladder of strided 3x3
        # convs, one step per channel-ratio octave (tpn.py:165-183:
        # int(log2(out_channels // channel)) steps).  Keyed on CHANNELS
        # like the reference — with equal-resolution stages of unequal
        # width (the AVA spatial_strides=(1,2,2,1) family) a
        # resolution-keyed loop would build a different ladder.
        c_top = stages[-1].shape[-1]
        sm = []
        for i, f in enumerate(stages):
            steps = int(np.log2(max(1, c_top // f.shape[-1])))
            for j in range(steps):
                f = nn.Conv(f.shape[-1] * 2, (1, 3, 3),
                            strides=(1, 2, 2),
                            padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                            name=f"sm{i}_conv{j}")(f)
                f = nn.relu(_bn(train, f"sm{i}_bn{j}")(f))
            sm.append(f)

        # temporal modulation per level
        tm = [
            _TemporalModulation(cfg.out_channels, cfg.downsample_scales[i],
                                cfg.groups, name=f"tm{i}")(sm[i])
            for i in range(n)]

        def resample_t(x, t):
            """nn.Upsample(nearest) / ceil-mode maxpool equivalents."""
            if x.shape[1] == t:
                return x
            if x.shape[1] < t:
                return jax.image.resize(
                    x, (x.shape[0], t) + x.shape[2:], "nearest")
            s = x.shape[1] // t
            return nn.max_pool(x, (s, 1, 1), strides=(s, 1, 1))

        # top-down pyramid (upsample hops are parameterless)
        outs = list(tm)
        for i in range(n - 1, 0, -1):
            outs[i - 1] = outs[i - 1] + resample_t(outs[i],
                                                   outs[i - 1].shape[1])
        top_down = _LevelFusion(cfg.mid_channels, cfg.lf_out_channels,
                                cfg.groups, name="fuse_td")(
            [resample_t(o, tm[-1].shape[1]) for o in outs], train=train)

        # bottom-up pyramid: each hop is a DownSample with a REAL
        # (3,1,1) conv (no BN/act) + pool (tpn.py:17-84, 375-378)
        outs = list(tm) if cfg.flow_type == "parallel" else outs
        for i in range(n - 1):
            hop = nn.Conv(cfg.out_channels, (3, 1, 1),
                          padding=((1, 1), (0, 0), (0, 0)),
                          use_bias=False, name=f"down{i}")(outs[i])
            outs[i + 1] = outs[i + 1] + resample_t(hop,
                                                   outs[i + 1].shape[1])
        bottom_up = _LevelFusion(cfg.mid_channels, cfg.lf_out_channels,
                                 cfg.groups, name="fuse_bu")(
            [resample_t(o, tm[-1].shape[1]) for o in outs], train=train)

        x = jnp.concatenate([top_down, bottom_up], axis=-1)
        x = nn.Conv(cfg.fusion_channels, (1, 1, 1), use_bias=False,
                    name="pyramid_fusion")(x)
        x = nn.relu(_bn(train, "pyramid_bn")(x))
        return x, aux
