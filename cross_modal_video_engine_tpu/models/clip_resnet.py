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
    # Reference contract (model.py:180-188): middle = the raw layer3 map
    # (16*width channels; RN50x4: 1280 at 18x18), which inference.py:58-59
    # then adaptive-avg-pools over (tokens, channels) to (16, 640).
    # Stage 2 (8*width = 640 channels) is kept as an option for pipelines
    # that want combiner-ready middles without the channel pooling.
    middle_stage: int = 3


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


@dataclasses.dataclass(frozen=True)
class CLIPResNetConfig:
    """Full CLIP dual tower with the ModifiedResNet visual (the RN50x4
    checkpoint MultiFusion loads, src/inference.py:179-196)."""
    embed_dim: int = 640
    vision_layers: Tuple[int, int, int, int] = (4, 6, 10, 6)
    vision_width: int = 80
    image_resolution: int = 288
    middle_stage: int = 3
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 640
    text_heads: int = 10
    text_layers: int = 12
    dtype: str = "float32"

    def vision_cfg(self) -> ModifiedResNetConfig:
        return ModifiedResNetConfig(
            layers=tuple(self.vision_layers), width=self.vision_width,
            output_dim=self.embed_dim,
            heads=self.vision_width * 32 // 64,
            image_resolution=self.image_resolution,
            middle_stage=self.middle_stage)

    def text_cfg(self):
        from .clip import CLIPConfig
        return CLIPConfig(
            embed_dim=self.embed_dim, context_length=self.context_length,
            vocab_size=self.vocab_size, text_width=self.text_width,
            text_heads=self.text_heads, text_layers=self.text_layers,
            dtype=self.dtype)


class CLIPResNetModel(nn.Module):
    """CLIP with ModifiedResNet visual + causal text transformer — the
    tower pair of the reference RN50x4 checkpoint.  `encode_image` returns
    (high, middle=layer3 map tokens) matching CLIP.encode_image's tuple
    (model.py:172-188)."""

    cfg: CLIPResNetConfig

    def setup(self):
        from .clip import TextTower
        self.visual = ModifiedResNet(self.cfg.vision_cfg(), name="visual")
        self.text = TextTower(self.cfg.text_cfg(), name="text")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07),
                                                 jnp.float32))

    def encode_image(self, images: jnp.ndarray):
        """(B, H, W, 3) -> (high (B, E), middle (B, h*w, C)).

        The middle "tokens" reproduce the reference's exact element order:
        inference.py:58 reshapes the torch NCHW layer3 buffer straight to
        (F, h*w, C) WITHOUT a transpose, so each row mixes channels and
        spatial positions.  The downstream combiner checkpoint was trained
        on that order, so we flatten c-major and re-chunk the same way.
        """
        high, middle = self.visual(images)
        B, H, W, C = middle.shape
        middle = middle.transpose(0, 3, 1, 2).reshape(B, H * W, C)
        return high, middle

    def encode_video(self, frames: jnp.ndarray):
        """(B, F, H, W, 3) -> (high (B, F, E), middle (B, F, h*w, C)):
        frames folded into the batch for one MXU pass."""
        B, F = frames.shape[0], frames.shape[1]
        flat = frames.reshape((B * F,) + frames.shape[2:])
        high, middle = self.encode_image(flat)
        return (high.reshape(B, F, -1),
                middle.reshape((B, F) + middle.shape[1:]))

    def encode_text(self, text_ids: jnp.ndarray):
        return self.text(text_ids)

    def __call__(self, images: jnp.ndarray, text_ids: jnp.ndarray):
        image_features, _ = self.encode_image(images)
        text_features = self.encode_text(text_ids)
        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True)
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * image_features @ text_features.T
        return logits_per_image, logits_per_image.T
