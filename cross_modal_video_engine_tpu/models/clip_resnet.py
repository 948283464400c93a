"""ModifiedResNet CLIP vision tower.

Rebuild of the reference's modified CLIP ResNet
(MultiFusion/src/model/model.py:120-188): 3-conv stem with avgpool,
anti-aliased Bottleneck blocks (avgpool before the stride-2 conv),
AttentionPool2d head — and the MultiFusion modification: `forward`
returns (pooled, middle) where middle is the **layer3** feature map
(model.py:180-188), whose channel count equals the attnpool output dim
region the Combiner consumes (RN50x4: 640).

Layout is NHWC throughout (TPU conv layout); BatchNorm carries running
stats in `batch_stats`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: Tuple[int, int, int, int] = (4, 6, 10, 6)   # RN50x4
    width: int = 80                                     # RN50x4 base width
    output_dim: int = 640
    heads: int = 40
    image_resolution: int = 288
    # which stage's map is the 'middle' feature the Combiner consumes.
    # The MultiFusion h5 dumps store 640-d middles for RN50x4 -> the
    # 640-channel stage (stage 2 here); set 3 for the raw layer3 map.
    middle_stage: int = 2


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        out = nn.relu(bn("bn1")(nn.Conv(self.planes, (1, 1), use_bias=False,
                                        name="conv1")(x)))
        out = nn.relu(bn("bn2")(nn.Conv(self.planes, (3, 3), padding=1,
                                        use_bias=False, name="conv2")(out)))
        if self.stride > 1:   # anti-aliased downsample: avgpool then conv
            out = nn.avg_pool(out, (self.stride, self.stride),
                              strides=(self.stride, self.stride))
        out = bn("bn3")(nn.Conv(self.planes * self.expansion, (1, 1),
                                use_bias=False, name="conv3")(out))
        if self.stride > 1 or x.shape[-1] != self.planes * self.expansion:
            sc = x
            if self.stride > 1:
                sc = nn.avg_pool(sc, (self.stride, self.stride),
                                 strides=(self.stride, self.stride))
            sc = bn("bn_down")(nn.Conv(self.planes * self.expansion, (1, 1),
                                       use_bias=False, name="conv_down")(sc))
        else:
            sc = x
        return nn.relu(out + sc)


class AttentionPool2d(nn.Module):
    embed_dim: int
    heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, output_dim). Mean token as query
        (model.py:76-118)."""
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)      # (B, HW+1, C)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(C ** -0.5),
                         (H * W + 1, C))
        tokens = tokens + pos
        hd = C // self.heads
        q = nn.Dense(C, name="q_proj")(tokens[:, :1])
        k = nn.Dense(C, name="k_proj")(tokens)
        v = nn.Dense(C, name="v_proj")(tokens)
        q = q.reshape(B, 1, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd), -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
        return nn.Dense(self.output_dim, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    cfg: ModifiedResNetConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (B, H, W, 3) -> (high (B, output_dim),
        middle (B, h3, w3, 8*width) = layer3 map)."""
        cfg = self.cfg
        w = cfg.width
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        x = nn.relu(bn("bn1")(nn.Conv(w // 2, (3, 3), strides=2, padding=1,
                                      use_bias=False, name="conv1")(images)))
        x = nn.relu(bn("bn2")(nn.Conv(w // 2, (3, 3), padding=1,
                                      use_bias=False, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(w, (3, 3), padding=1, use_bias=False,
                                      name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        def stage(x, planes, blocks, stride, name):
            x = BottleneckBlock(planes, stride, name=f"{name}_0")(
                x, train=train)
            for i in range(1, blocks):
                x = BottleneckBlock(planes, 1, name=f"{name}_{i}")(
                    x, train=train)
            return x

        x = stage(x, w, cfg.layers[0], 1, "layer1")
        x = stage(x, w * 2, cfg.layers[1], 2, "layer2")
        if cfg.middle_stage == 2:
            middle = x                                       # (B, h, w, 8w)
        x = stage(x, w * 4, cfg.layers[2], 2, "layer3")
        if cfg.middle_stage == 3:
            middle = x                                       # (B, h, w, 16w)
        x = stage(x, w * 8, cfg.layers[3], 2, "layer4")
        high = AttentionPool2d(w * 8 * 4, cfg.heads, cfg.output_dim,
                               name="attnpool")(x)
        return high, middle
