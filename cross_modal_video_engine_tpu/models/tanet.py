"""TANet: Temporal Adaptive Module on ResNet blocks.

TPU rebuild of mmaction's TANet backbone family: each block carries a TAM
that aggregates along time with (a) a video-adaptive GLOBAL temporal
kernel (FC branch, softmaxed, applied as grouped temporal conv) and (b) a
LOCAL per-frame channel attention (conv branch, sigmoid).

The global-kernel convolution is an einsum over a small (K,) kernel per
video — static shapes, MXU/VPU friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import BACKBONES


class TAM(nn.Module):
    """mmaction common/tam.py:34-122 exactly: global branch
    Linear(T->Ta, no bias) -> BN -> ReLU -> Linear(Ta->K, no bias) ->
    softmax builds a per-(video, channel) temporal kernel; local branch
    Conv1d(C->C/b, k3, no bias) -> BN -> ReLU -> Conv1d(C/b->C, k1,
    no bias) -> sigmoid gates frames; gated features get the adaptive
    kernel as a depthwise temporal conv (stride/pad 1)."""

    channels: int
    kernel: int = 3               # adaptive_kernel_size
    alpha: int = 2
    beta: int = 4
    conv1d_kernel: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False
                 ) -> jnp.ndarray:
        """x: (B, T, H, W, C)."""
        B, T, H, W, C = x.shape
        K = self.kernel
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, name=n)
        ctx = x.mean(axis=(2, 3))                     # (B, T, C)

        # global branch: per-channel adaptive temporal kernel
        g = ctx.transpose(0, 2, 1).reshape(B * C, T)  # (B*C, T)
        g = nn.Dense(T * self.alpha, use_bias=False, name="g_fc1")(g)
        g = nn.relu(bn("g_bn")(g))
        g = nn.Dense(K, use_bias=False, name="g_fc2")(g)
        g = jax.nn.softmax(g, axis=-1).reshape(B, C, K)

        # local branch: per-frame channel importance
        ck = self.conv1d_kernel
        l = nn.Conv(C // self.beta, (ck,), padding=ck // 2,
                    use_bias=False, name="l_conv1")(ctx)
        l = nn.relu(bn("l_bn")(l))
        l = nn.Conv(C, (1,), use_bias=False, name="l_conv2")(l)
        l = jax.nn.sigmoid(l)                         # (B, T, C)

        x = x * l[:, :, None, None, :]

        # apply the adaptive kernel as a depthwise temporal conv
        pad = K // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        out = jnp.zeros_like(x)
        for k in range(K):
            out = out + xp[:, k:k + T] * g[:, None, None, None, :, k]
        return out


class TABlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, T, H, W, C) — 2D convs fold T into the batch; TAM mixes
        time between conv1 and conv2 (mmaction TABlock placement)."""
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, name=n)
        B, T = x.shape[:2]
        flat = lambda y: y.reshape((B * T,) + y.shape[2:])
        unflat = lambda y: y.reshape((B, T) + y.shape[1:])

        h = nn.relu(bn("bn1")(nn.Conv(self.planes, (1, 1), use_bias=False,
                                      name="conv1")(flat(x))))
        h = TAM(self.planes, name="tam")(unflat(h), train=train)
        h = flat(h)
        h = nn.relu(bn("bn2")(nn.Conv(self.planes, (3, 3),
                                      strides=self.stride, padding=1,
                                      use_bias=False, name="conv2")(h)))
        h = bn("bn3")(nn.Conv(self.planes * self.expansion, (1, 1),
                              use_bias=False, name="conv3")(h))
        xf = flat(x)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            sc = bn("bn_down")(nn.Conv(self.planes * self.expansion, (1, 1),
                                       strides=self.stride, use_bias=False,
                                       name="downsample")(xf))
        else:
            sc = xf
        return unflat(nn.relu(h + sc))


@dataclasses.dataclass(frozen=True)
class TANetConfig:
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    base_channels: int = 64


@BACKBONES.register("TANet")
class TANet(nn.Module):
    cfg: TANetConfig

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        """(B, T, H, W, 3) -> (B, T, C) per-frame features (TSNHead
        consensus on top, like the 2D recognizers)."""
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
            stride = 1 if i == 0 else 2
            x = TABlock(planes, stride, name=f"layer{i+1}_0")(x, train=train)
            for j in range(1, blocks):
                x = TABlock(planes, 1, name=f"layer{i+1}_{j}")(x, train=train)
            planes *= 2
        return jnp.mean(x, axis=(2, 3))
