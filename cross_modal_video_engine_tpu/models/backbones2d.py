"""2D-per-frame and lightweight 3D backbones: TSM-ResNet, C3D, R(2+1)D.

TPU rebuilds of the corresponding mmaction backbones:

* `TSMResNet` — ResNet-style 2D blocks with the Temporal Shift Module:
  1/8 of channels shift forward in time, 1/8 backward, the rest stay
  (backbones/resnet_tsm.py semantics).  On TPU the shift is a pad+slice
  on the (B, T, ...) layout — pure data movement XLA fuses into the
  next conv.
* `C3D` — the classic 8-conv 3x3x3 stack (backbones/c3d.py).
* `R2Plus1D` — ResNet3D with every 3x3x3 factored into 1x3x3 then 3x1x1
  with the mid-plane count matching the (2+1)D paper
  (backbones/resnet2plus1d.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import BACKBONES


def temporal_shift(x: jnp.ndarray, shift_div: int = 8) -> jnp.ndarray:
    """(B, T, H, W, C): first C/div channels shift t-1 -> t, next C/div
    shift t+1 -> t, rest unchanged (zero-padded at clip edges)."""
    c = x.shape[-1]
    fold = c // shift_div
    left = jnp.pad(x[:, 1:, ..., :fold], ((0, 0), (0, 1), (0, 0), (0, 0),
                                          (0, 0)))
    right = jnp.pad(x[:, :-1, ..., fold:2 * fold],
                    ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    return jnp.concatenate([left, right, x[..., 2 * fold:]], axis=-1)


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class TSMBlock(nn.Module):
    planes: int
    stride: int = 1
    shift_div: int = 8
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, T, H, W, C).  shift_div=0 disables the shift — the
        block degrades to a plain per-frame bottleneck, which is exactly
        mmaction's TSN ResNet (the TSM paper's ablation baseline)."""
        h = temporal_shift(x, self.shift_div) if self.shift_div else x
        B, T = h.shape[:2]
        h2 = h.reshape((B * T,) + h.shape[2:])
        out = nn.relu(_bn(train, "bn1")(
            nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(h2)))
        out = nn.relu(_bn(train, "bn2")(
            nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(out)))
        out = _bn(train, "bn3")(
            nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(out))
        x2 = x.reshape((B * T,) + x.shape[2:])
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            sc = _bn(train, "bn_down")(
                nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=self.stride, use_bias=False,
                        name="downsample")(x2))
        else:
            sc = x2
        out = nn.relu(out + sc)
        return out.reshape((B, T) + out.shape[1:])


@dataclasses.dataclass(frozen=True)
class TSMConfig:
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    base_channels: int = 64
    shift_div: int = 8


@BACKBONES.register("TSMResNet")
class TSMResNet(nn.Module):
    cfg: TSMConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        """(B, T, H, W, 3) -> (B, T, C) per-frame features (feed TSNHead
        for segment consensus)."""
        cfg = self.cfg
        B, T = videos.shape[:2]
        x = videos.reshape((B * T,) + videos.shape[2:])
        x = nn.Conv(cfg.base_channels, (7, 7), strides=2, padding=3,
                    use_bias=False, name="conv1")(x)
        x = nn.relu(_bn(train, "bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = x.reshape((B, T) + x.shape[1:])
        planes = cfg.base_channels
        for i, blocks in enumerate(cfg.stage_blocks):
            stride = 1 if i == 0 else 2
            x = TSMBlock(planes, stride, cfg.shift_div,
                         name=f"layer{i+1}_0")(x, train=train)
            for j in range(1, blocks):
                x = TSMBlock(planes, 1, cfg.shift_div,
                             name=f"layer{i+1}_{j}")(x, train=train)
            planes *= 2
        return jnp.mean(x, axis=(2, 3))      # (B, T, C)


@BACKBONES.register("C3D")
class C3D(nn.Module):
    """c3d.py: conv1a..conv5b + fc6/fc7 (4096).

    ``exact_head=True`` reproduces the mmaction head precisely for
    checkpoint import (c3d.py:64-83,120-135): pool5 is a 2x2x2 max pool
    with (0,1,1) spatial padding and fc6 consumes the FLATTENED
    (512,1,4,4)=8192 map at the canonical 16x112x112 input, not a
    global average.  The default keeps the global-pool head, which is
    input-size agnostic."""

    fc_dim: int = 4096
    exact_head: bool = False

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        x = videos
        def conv(x, ch, name):
            x = nn.Conv(ch, (3, 3, 3), padding=1, name=name)(x)
            return nn.relu(x)
        x = conv(x, 64, "conv1a")
        x = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))
        x = conv(x, 128, "conv2a")
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = conv(x, 256, "conv3a")
        x = conv(x, 256, "conv3b")
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = conv(x, 512, "conv4a")
        x = conv(x, 512, "conv4b")
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = conv(x, 512, "conv5a")
        x = conv(x, 512, "conv5b")
        if self.exact_head:
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2),
                            padding=((0, 0), (1, 1), (1, 1)))
            # torch flattens channel-first (C, T, H, W); match that
            # order so imported fc6 weights line up
            x = x.transpose(0, 4, 1, 2, 3).reshape(x.shape[0], -1)
        else:
            x = jnp.mean(x, axis=(1, 2, 3))
        x = nn.relu(nn.Dense(self.fc_dim, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.fc_dim, name="fc7")(x))
        return x


def conv2plus1d_mid(in_c: int, out_c: int, kt: int, kh: int, kw: int
                    ) -> int:
    """mmaction Conv2plus1d mid-plane formula (common/conv2plus1d.py:
    60-65): M = floor(t * d^2 * N_in * N_out / (d^2 * N_in + t * N_out))."""
    return max(int(kt * kh * kw * in_c * out_c
                   // (kh * kw * in_c + kt * out_c)), 1)


class Conv2Plus1D(nn.Module):
    """mmaction's Conv2plus1d (common/conv2plus1d.py): spatial conv ->
    bn_s -> relu -> temporal conv, with the paper's mid-plane formula.
    Used for every conv in ResNet2Plus1d — including the 1x1x1
    downsample convs, which mmaction also factorizes."""

    out_ch: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        kt, kh, kw = self.kernel
        t, s1, s2 = self.stride
        mid = conv2plus1d_mid(x.shape[-1], self.out_ch, kt, kh, kw)
        x = nn.Conv(mid, (1, kh, kw), strides=(1, s1, s2),
                    padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
                    use_bias=False, name="conv_s")(x)
        x = nn.relu(_bn(train, "bn_s")(x))
        return nn.Conv(self.out_ch, (kt, 1, 1), strides=(t, 1, 1),
                       padding=((kt // 2, kt // 2), (0, 0), (0, 0)),
                       use_bias=False, name="conv_t")(x)


class R2Plus1DBlock(nn.Module):
    """BasicBlock3d with Conv2plus1d convs (backbones/resnet3d.py:24-165
    under conv_cfg=Conv2plus1d): conv1 strides both time and space,
    conv2 is stride-1, the residual downsample is a factorized 1x1x1."""

    planes: int
    stride: int = 1          # applied to BOTH temporal and spatial dims
                             # (r2plus1d_r34.py: temporal_strides ==
                             # spatial_strides == (1, 2, 2, 2))

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_c = x.shape[-1]
        s = self.stride
        out = Conv2Plus1D(self.planes, (3, 3, 3), (s, s, s),
                          name="conv1")(x, train=train)
        out = nn.relu(_bn(train, "bn1")(out))
        out = Conv2Plus1D(self.planes, (3, 3, 3), name="conv2")(
            out, train=train)
        out = _bn(train, "bn2")(out)
        if s != 1 or in_c != self.planes:
            sc = Conv2Plus1D(self.planes, (1, 1, 1), (s, s, s),
                             name="downsample")(x, train=train)
            sc = _bn(train, "bn_down")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


@dataclasses.dataclass(frozen=True)
class R2Plus1DConfig:
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)   # r2+1d-34
    base_channels: int = 64


@BACKBONES.register("R2Plus1D")
class R2Plus1D(nn.Module):
    """mmaction ResNet2Plus1d (backbones/resnet2plus1d.py + the
    r2plus1d_r34 recipe): factorized (3,7,7) stem with the formula mid
    width (83 for 3->64, NOT torchvision's 45), (1,3,3) stem max pool,
    BasicBlock stages with equal temporal/spatial strides, no pool2."""

    cfg: R2Plus1DConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        cfg = self.cfg
        x = Conv2Plus1D(cfg.base_channels, (3, 7, 7), (1, 2, 2),
                        name="conv1")(videos, train=train)
        x = nn.relu(_bn(train, "bn1")(x))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        planes = cfg.base_channels
        for i, blocks in enumerate(cfg.stage_blocks):
            stride = 1 if i == 0 else 2
            x = R2Plus1DBlock(planes, stride, name=f"layer{i+1}_0")(
                x, train=train)
            for j in range(1, blocks):
                x = R2Plus1DBlock(planes, 1, name=f"layer{i+1}_{j}")(
                    x, train=train)
            planes *= 2
        return jnp.mean(x, axis=(1, 2, 3))
