"""TIN (Temporal Interlace) and MobileNetV2-TSM backbones.

* `TemporalInterlace` — mmaction's TIN shift: the network LEARNS per-group
  fractional temporal offsets (and gates); features are sampled at t +
  offset with linear interpolation.  On TPU the data-dependent shift is a
  static gather of floor/ceil neighbors blended by the fractional part —
  no dynamic indexing.
* `MobileNetV2TSM` — inverted-residual MobileNetV2 with the TSM temporal
  shift inserted in each residual block (mmaction mobilenet_v2_tsm.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .backbones2d import temporal_shift
from ..utils.registry import BACKBONES


class TemporalInterlace(nn.Module):
    """x: (B, T, H, W, C); shifts the first 1/shift_div channels by a
    learned fractional offset per channel-group, gated by a learned
    sigmoid weight (TIN's deformable shift)."""

    channels: int
    shift_div: int = 4
    groups: int = 2

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        fold = C // self.shift_div
        ctx = x.mean(axis=(2, 3))                     # (B, T, C)
        g = ctx.transpose(0, 2, 1).reshape(B, -1)     # (B, C*T)
        h = nn.relu(nn.Dense(T * 4, name="off_fc1")(g))
        offsets = jnp.tanh(nn.Dense(self.groups, name="off_fc2")(h))  # (B,G)
        gates = jax.nn.sigmoid(nn.Dense(self.groups, name="gate_fc")(h))

        shifted = x[..., :fold]
        per_group = fold // self.groups
        outs = []
        t_idx = jnp.arange(T, dtype=jnp.float32)
        for gi in range(self.groups):
            off = offsets[:, gi]                       # (B,) in [-1, 1]
            pos = t_idx[None, :] + off[:, None]        # (B, T)
            lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
            hi = jnp.clip(lo + 1, 0, T - 1)
            frac = (pos - jnp.floor(pos))[:, :, None, None, None]
            sl = shifted[..., gi * per_group:(gi + 1) * per_group]
            g_lo = jnp.take_along_axis(
                sl, lo[:, :, None, None, None].repeat(H, 2).repeat(W, 3)
                .repeat(per_group, 4), axis=1)
            g_hi = jnp.take_along_axis(
                sl, hi[:, :, None, None, None].repeat(H, 2).repeat(W, 3)
                .repeat(per_group, 4), axis=1)
            interp = (1 - frac) * g_lo + frac * g_hi
            outs.append(interp * gates[:, gi][:, None, None, None, None])
        return jnp.concatenate(outs + [x[..., fold:]], axis=-1)


@dataclasses.dataclass(frozen=True)
class TINConfig:
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    base_channels: int = 64
    shift_div: int = 4


@BACKBONES.register("TIN")
class TINResNet(nn.Module):
    """ResNet-50-style with TemporalInterlace before each stage's first
    block (TIN placement); returns (B, T, C) per-frame features."""

    cfg: TINConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        from .backbones2d import TSMBlock   # reuse 2D bottleneck structure
        cfg = self.cfg
        B, T = videos.shape[:2]
        x = videos.reshape((B * T,) + videos.shape[2:])
        x = nn.Conv(cfg.base_channels, (7, 7), strides=2, padding=3,
                    use_bias=False, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = x.reshape((B, T) + x.shape[1:])
        planes = cfg.base_channels
        for i, blocks in enumerate(cfg.stage_blocks):
            x = TemporalInterlace(x.shape[-1], cfg.shift_div,
                                  name=f"interlace_{i}")(x)
            stride = 1 if i == 0 else 2
            for j in range(blocks):
                x = TSMBlock(planes, stride if j == 0 else 1,
                             shift_div=10 ** 9,   # disable TSM's own shift
                             name=f"layer{i+1}_{j}")(x, train=train)
            planes *= 2
        return jnp.mean(x, axis=(2, 3))


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int = 1
    expand: int = 6
    use_tsm: bool = True
    shift_div: int = 8

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, T, H, W, C)."""
        B, T = x.shape[:2]
        C = x.shape[-1]
        h = x
        if self.use_tsm and self.stride == 1 and C == self.out_ch:
            h = temporal_shift(h, self.shift_div)
        hf = h.reshape((B * T,) + h.shape[2:])
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, name=n)
        mid = C * self.expand
        if self.expand != 1:
            y = nn.relu6(bn("bn1")(nn.Conv(mid, (1, 1), use_bias=False,
                                           name="expand")(hf)))
        else:
            # mmaction mobilenet_v2.py:76-84 skips the expand ConvModule
            # entirely at expand_ratio=1 (checkpoint parity)
            y = hf
        y = nn.relu6(bn("bn2")(nn.Conv(mid, (3, 3), strides=self.stride,
                                       padding=1, feature_group_count=mid,
                                       use_bias=False, name="dw")(y)))
        y = bn("bn3")(nn.Conv(self.out_ch, (1, 1), use_bias=False,
                              name="project")(y))
        y = y.reshape((B, T) + y.shape[1:])
        if self.stride == 1 and C == self.out_ch:
            return x + y
        return y


@dataclasses.dataclass(frozen=True)
class MobileNetV2TSMConfig:
    # (expand, out_ch, blocks, stride) per stage — standard MobileNetV2
    stages: Tuple = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                     (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                     (6, 320, 1, 1))
    last_channels: int = 1280
    shift_div: int = 8


@BACKBONES.register("MobileNetV2TSM")
class MobileNetV2TSM(nn.Module):
    cfg: MobileNetV2TSMConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        cfg = self.cfg
        B, T = videos.shape[:2]
        x = videos.reshape((B * T,) + videos.shape[2:])
        x = nn.relu6(nn.BatchNorm(use_running_average=not train,
                                  momentum=0.9, name="bn_stem")(
            nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                    name="stem")(x)))
        x = x.reshape((B, T) + x.shape[1:])
        for si, (e, c, n, s) in enumerate(cfg.stages):
            for j in range(n):
                x = InvertedResidual(c, s if j == 0 else 1, e,
                                     shift_div=cfg.shift_div,
                                     name=f"s{si}_b{j}")(x, train=train)
        xf = x.reshape((B * T,) + x.shape[2:])
        # mmaction conv2 is a full ConvModule: conv + BN + relu6
        xf = nn.relu6(nn.BatchNorm(use_running_average=not train,
                                   momentum=0.9, name="bn_head")(
            nn.Conv(cfg.last_channels, (1, 1), use_bias=False,
                    name="head")(xf)))
        x = xf.reshape((B, T) + xf.shape[1:])
        return jnp.mean(x, axis=(2, 3))       # (B, T, last_channels)


# ---------------------------------------------------------------------------
# Exact TIN (checkpoint-compatible with mmaction resnet_tin.py)
# ---------------------------------------------------------------------------


def tin_shift(data: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """mmcv.ops.tin_shift semantics: data (N, T, C, HW); shift (N, G)
    integer temporal shifts, channels split into G contiguous groups;
    out[n, t, c] = data[n, t - shift[n, g_c], c] (zero out of range).

    Direction: mmcv's tin_shift_cuda_kernel.cuh computes
    ``data_id = i - t_shift; output[t=i] = input[t=data_id]`` — the
    source index is t MINUS the shift (a positive shift delays the
    signal), so we gather at ``t - shift`` here."""
    N, T, C, HW = data.shape
    G = shift.shape[1]
    gsize = C // G
    group_of_c = jnp.arange(C) // gsize                        # (C,)
    t_src = (jnp.arange(T)[None, :, None]
             - shift[:, None, :][:, :, group_of_c])            # (N, T, C)
    valid = (t_src >= 0) & (t_src < T)
    gathered = jnp.take_along_axis(
        data, jnp.clip(t_src, 0, T - 1)[..., None], axis=1)
    return jnp.where(valid[..., None], gathered, 0.0)


def linear_sampler(data: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """resnet_tin.py:9-62: fractional temporal shift = floor/ceil
    tin_shifts blended by the fractional part.  data
    (N, T, F, H, W); offset (N, G)."""
    n, t, f, h, w = data.shape
    off0 = jnp.floor(offset).astype(jnp.int32)
    flat = data.reshape(n, t, f, h * w)
    d0 = tin_shift(flat, off0)
    d1 = tin_shift(flat, off0 + 1)
    w0 = 1.0 - (offset - jnp.floor(offset))                    # (N, G)
    gsize = f // offset.shape[1]
    w0c = jnp.repeat(w0, gsize, axis=1)                        # (N, F)
    w0c = w0c[:, None, :, None]
    out = w0c * d0 + (1.0 - w0c) * d1
    return out.reshape(n, t, f, h, w)


class TINOffsetNet(nn.Module):
    """resnet_tin.py OffsetNet: conv1d(C', 1, 3) + fc(T, T) + relu +
    fc(T, G), output 4*(sigmoid(x)-0.5) in (-2, 2)."""

    num_segments: int
    groups: int = 2

    @nn.compact
    def __call__(self, x):                      # x: (N, C', T)
        h = nn.Conv(1, (3,), padding=1, name="conv")(
            x.transpose(0, 2, 1))               # (N, T, 1)
        h = h[..., 0]                           # (N, T)
        h = nn.relu(nn.Dense(self.num_segments, name="fc1")(h))
        h = nn.Dense(self.groups, name="fc2")(h)
        return 4.0 * (jax.nn.sigmoid(h) - 0.5)  # (N, G)


class TINWeightNet(nn.Module):
    """resnet_tin.py WeightNet: conv1d(C', G, 3), 2*sigmoid -> (0, 2)."""

    groups: int = 2

    @nn.compact
    def __call__(self, x):                      # x: (N, C', T)
        h = nn.Conv(self.groups, (3,), padding=1, name="conv")(
            x.transpose(0, 2, 1))               # (N, T, G)
        return 2.0 * jax.nn.sigmoid(h)


class TemporalInterlaceExact(nn.Module):
    """resnet_tin.py TemporalInterlace, weight-compatible: only the first
    C/shift_div channels are deformed; offsets come out as
    [+o0, +o1, -o0, -o1] over 4 temporal groups and the 2 learned gates
    tile over channels as [g0, g1, g0, g1] quarters."""

    num_segments: int
    shift_div: int = 4
    deform_groups: int = 2

    @nn.compact
    def __call__(self, x):                      # x: (B*T, H, W, C)
        T = self.num_segments
        n, H, W, C = x.shape
        nb = n // T
        folds = C // self.shift_div
        desc = x[..., :folds].reshape(nb, T, H, W, folds)
        desc = desc.transpose(0, 1, 4, 2, 3)    # (nb, T, F, H, W)
        pooled = desc.mean(axis=(3, 4))         # (nb, T, F)
        pooled = pooled.transpose(0, 2, 1)      # (nb, F, T)

        off = TINOffsetNet(T, self.deform_groups,
                           name="offset_net")(pooled)        # (nb, 2)
        wgt = TINWeightNet(self.deform_groups,
                           name="weight_net")(pooled)        # (nb, T, 2)

        off4 = jnp.concatenate([off, -off], axis=1)          # (nb, 4)
        shifted = linear_sampler(desc, off4)                 # (nb,T,F,H,W)

        q = folds // 2 // 2
        wchan = jnp.repeat(jnp.tile(wgt, (1, 1, 2)), q, axis=2)  # (nb,T,F)
        shifted = shifted * wchan[:, :, :, None, None]
        shifted = shifted.transpose(0, 1, 3, 4, 2)           # nb,T,H,W,F
        shifted = shifted.reshape(n, H, W, folds)
        return jnp.concatenate([shifted, x[..., folds:]], axis=-1)


class TINBlock(nn.Module):
    """mmaction 2D ResNet bottleneck with the interlace applied to
    conv1's input (CombineNet wrapping, resnet_tin.py:344-358)."""

    planes: int
    stride: int = 1
    num_segments: int = 8
    shift_div: int = 4
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, name=name)

        h = TemporalInterlaceExact(self.num_segments, self.shift_div,
                                   name="interlace")(x)
        out = nn.relu(bn("bn1")(
            nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(h)))
        out = nn.relu(bn("bn2")(
            nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(out)))
        out = bn("bn3")(
            nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(out))
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            sc = bn("bn_down")(
                nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=self.stride, use_bias=False,
                        name="downsample")(x))
        else:
            sc = x
        return nn.relu(out + sc)


@dataclasses.dataclass(frozen=True)
class TINExactConfig:
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    base_channels: int = 64
    num_segments: int = 8
    shift_div: int = 4


@BACKBONES.register("TINResNetExact")
class TINResNetExact(nn.Module):
    """Checkpoint-compatible ResNetTIN: every block interlaces its input
    (n_round=1, resnet_tin.py:334-358).  (B, T, H, W, 3) -> (B, T, C)
    per-frame features for TSNHead consensus."""

    cfg: TINExactConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, name=name)

        cfg = self.cfg
        B, T = videos.shape[:2]
        x = videos.reshape((B * T,) + videos.shape[2:])
        x = nn.Conv(cfg.base_channels, (7, 7), strides=2, padding=3,
                    use_bias=False, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        planes = cfg.base_channels
        for i, blocks in enumerate(cfg.stage_blocks):
            stride = 1 if i == 0 else 2
            for j in range(blocks):
                x = TINBlock(planes, stride if j == 0 else 1,
                             cfg.num_segments, cfg.shift_div,
                             name=f"layer{i+1}_{j}")(x, train=train)
            planes *= 2
        x = x.reshape((B, T) + x.shape[1:])
        return jnp.mean(x, axis=(2, 3))
