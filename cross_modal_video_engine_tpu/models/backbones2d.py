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
        """x: (B, T, H, W, C)."""
        h = temporal_shift(x, self.shift_div)
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
    """c3d.py: conv1a..conv5b + fc6/fc7 (4096)."""

    fc_dim: int = 4096

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
        x = jnp.mean(x, axis=(1, 2, 3))
        x = nn.relu(nn.Dense(self.fc_dim, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.fc_dim, name="fc7")(x))
        return x


class R2Plus1DBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1   # r2+1d uses BasicBlock style

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_c = x.shape[-1]
        # factored conv: mid planes per the (2+1)D paper
        def conv2p1(x, out_c, stride, name):
            mid = (3 * 3 * 3 * in_c * out_c) // (3 * 3 * in_c + 3 * out_c)
            mid = max(mid, 1)
            x = nn.Conv(mid, (1, 3, 3), strides=(1, stride, stride),
                        padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                        name=f"{name}_s")(x)
            x = nn.relu(_bn(train, f"{name}_bn_s")(x))
            x = nn.Conv(out_c, (3, 1, 1), strides=(stride, 1, 1),
                        padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                        name=f"{name}_t")(x)
            return x

        out = nn.relu(_bn(train, "bn1")(conv2p1(x, self.planes, self.stride,
                                                "conv1")))
        out = _bn(train, "bn2")(conv2p1(out, self.planes, 1, "conv2"))
        if self.stride != 1 or in_c != self.planes:
            sc = nn.Conv(self.planes, (1, 1, 1),
                         strides=(self.stride,) * 3, use_bias=False,
                         name="downsample")(x)
            sc = _bn(train, "bn_down")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


@dataclasses.dataclass(frozen=True)
class R2Plus1DConfig:
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2)   # r2+1d-18
    base_channels: int = 64


@BACKBONES.register("R2Plus1D")
class R2Plus1D(nn.Module):
    cfg: R2Plus1DConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        cfg = self.cfg
        x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                    padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
                    name="stem_s")(videos)
        x = nn.relu(_bn(train, "stem_bn_s")(x))
        x = nn.Conv(cfg.base_channels, (3, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                    name="stem_t")(x)
        x = nn.relu(_bn(train, "stem_bn_t")(x))
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
