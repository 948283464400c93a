"""VideoCLIP backbone: contrastive video-text model with per-second video
tokens.

The reference (MCT/mmaction/models/backbones/videoclip.py:13-77) wraps
fairseq MMPT's VideoCLIP — an S3D video encoder producing one token per
second of video, fused with text by a BERT-style transformer; its
`forward` reshapes (B, T, H, W, C) into (B, T//fps, fps, ...) seconds and
returns the pooled video embedding.  fairseq/MMPT is not portable, so
this is a self-contained TPU-native model with the same contract:

  * `S3DLite` — separable 3-D conv stack -> one feature per second;
  * a transformer over [CLS] + second-tokens -> `pooled_video`;
  * a text tower sharing the transformer width -> `pooled_text`;
  * `__call__(video, text_ids)` -> contrastive logits.

As an mmaction-style backbone, `forward(x)` == `encode_video`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import BACKBONES
from .clip import LayerNormF32, Transformer


@dataclasses.dataclass(frozen=True)
class VideoCLIPConfig:
    fps: int = 4                   # frames folded into one video token
    s3d_channels: int = 64
    width: int = 256               # transformer / embedding width
    layers: int = 4
    heads: int = 4
    vocab_size: int = 30522        # BERT-style text vocab
    max_text_len: int = 32
    max_video_len: int = 32        # max seconds


class S3DLite(nn.Module):
    """Separable (2+1)D conv encoder: one pooled feature per second-clip.
    Input (B, S, fps, H, W, 3) -> (B, S, width)."""

    channels: int
    width: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, S = x.shape[0], x.shape[1]
        x = x.reshape((B * S,) + x.shape[2:])       # (BS, fps, H, W, 3)
        c = self.channels
        x = nn.Conv(c, (1, 7, 7), strides=(1, 2, 2), padding=(0, 3, 3),
                    name="conv_s1")(x)
        x = nn.relu(nn.Conv(c, (3, 1, 1), padding=(1, 0, 0),
                            name="conv_t1")(x))
        x = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))
        x = nn.Conv(2 * c, (1, 3, 3), padding=(0, 1, 1), name="conv_s2")(x)
        x = nn.relu(nn.Conv(2 * c, (3, 1, 1), padding=(1, 0, 0),
                            name="conv_t2")(x))
        x = x.mean(axis=(1, 2, 3))                   # (BS, 2c)
        x = nn.Dense(self.width, name="proj")(x)
        return x.reshape(B, S, self.width)


@BACKBONES.register("VideoCLIP")
class VideoCLIP(nn.Module):
    cfg: VideoCLIPConfig

    def setup(self):
        c = self.cfg
        self.s3d = S3DLite(c.s3d_channels, c.width, name="video_encoder")
        self.video_cls = self.param("video_cls",
                                    nn.initializers.normal(0.02), (c.width,))
        self.video_pos = self.param(
            "video_pos", nn.initializers.normal(0.01),
            (c.max_video_len + 1, c.width))
        self.video_transformer = Transformer(c.width, c.layers, c.heads,
                                             name="video_transformer")
        self.ln_video = LayerNormF32(name="ln_video")

        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (c.vocab_size, c.width))
        self.text_pos = self.param("text_pos", nn.initializers.normal(0.01),
                                   (c.max_text_len, c.width))
        self.text_transformer = Transformer(c.width, c.layers, c.heads,
                                            name="text_transformer")
        self.ln_text = LayerNormF32(name="ln_text")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07),
                                                 jnp.float32))

    def encode_video(self, videos: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) -> pooled video embedding (B, width); frames
        are folded into T//fps second-tokens like the reference forward
        (videoclip.py:66-77)."""
        c = self.cfg
        B, T = videos.shape[0], videos.shape[1]
        secs = max(T // c.fps, 1)
        videos = videos[:, : secs * c.fps]
        x = videos.reshape((B, secs, c.fps) + videos.shape[2:])
        tokens = self.s3d(x)                          # (B, secs, width)
        cls = jnp.broadcast_to(self.video_cls, (B, 1, c.width))
        h = jnp.concatenate([cls, tokens], axis=1)
        h = h + self.video_pos[: h.shape[1]]
        h = self.video_transformer(h)
        return self.ln_video(h[:, 0])

    def encode_text(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, L) int ids -> pooled text embedding (B, width); id 0 is
        padding: masked out of attention, pooling averages non-pad token
        outputs."""
        h = self.token_embedding[text_ids]
        h = h + self.text_pos[: h.shape[1]]
        pad_mask = jnp.where(
            (text_ids == 0)[:, None, None, :], -1e9, 0.0)   # (B,1,1,S)
        h = self.text_transformer(h, pad_mask)
        h = self.ln_text(h)
        mask = (text_ids != 0).astype(h.dtype)[..., None]
        return (h * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)

    def __call__(self, videos: jnp.ndarray, text_ids: jnp.ndarray):
        v = self.encode_video(videos)
        t = self.encode_text(text_ids)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits = scale * v @ t.T
        return logits, logits.T

    def forward(self, videos: jnp.ndarray) -> jnp.ndarray:
        """mmaction backbone contract: features = pooled video embedding."""
        return self.encode_video(videos)
