"""AVA spatio-temporal action detection head (RoI head).

TPU rebuild of the reference AVA detection stack
(MCT/mmaction/models/heads/bbox_head.py:34-118 + the mmcv RoIAlign the
roi extractor delegates to): the backbone feature map is temporally
pooled, person boxes are RoIAligned (bilinear, aligned=True semantics),
spatially max-pooled, and classified with a multilabel sigmoid head
(class 0 reserved, BCE loss).  Consumes the boxes/labels the AVADataset
(data/datasets_extra.py) yields.

roi_align is pure jnp — one gather + weighted sum per sample point — so
the whole head jits and differentiates.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray, out_size: int = 8,
              sampling_ratio: int = 2, aligned: bool = True) -> jnp.ndarray:
    """Bilinear RoIAlign over one feature map.

    feat: (H, W, C); boxes: (N, 4) pixel coords (x1, y1, x2, y2).
    Returns (N, out_size, out_size, C).  aligned=True shifts sample
    coordinates by -0.5 (the mmcv/Detectron2 convention).
    """
    H, W, C = feat.shape
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    n = out_size * sampling_ratio
    steps = (jnp.arange(n) + 0.5) / n
    ys = y1[:, None] + steps[None, :] * bh[:, None] - off      # (N, n)
    xs = x1[:, None] + steps[None, :] * bw[:, None] - off

    def sample(ys, xs):
        y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
        y1i = jnp.clip(y0 + 1, 0, H - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, W - 1).astype(jnp.int32)
        wy = jnp.clip(ys - y0, 0.0, 1.0)
        wx = jnp.clip(xs - x0, 0.0, 1.0)
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        # (N, n, n, C) bilinear blend of the four corners
        f00 = feat[y0[:, :, None], x0[:, None, :]]
        f01 = feat[y0[:, :, None], x1i[:, None, :]]
        f10 = feat[y1i[:, :, None], x0[:, None, :]]
        f11 = feat[y1i[:, :, None], x1i[:, None, :]]
        wy = wy[:, :, None, None]
        wx = wx[:, None, :, None]
        return ((1 - wy) * (1 - wx) * f00 + (1 - wy) * wx * f01
                + wy * (1 - wx) * f10 + wy * wx * f11)

    vals = sample(ys, xs)                                       # (N,n,n,C)
    r = sampling_ratio
    vals = vals.reshape(-1, out_size, r, out_size, r, C)
    return vals.mean(axis=(2, 4))


@dataclasses.dataclass(frozen=True)
class AVAHeadConfig:
    num_classes: int = 81             # class 0 reserved, like the reference
    in_channels: int = 2048
    roi_size: int = 8
    sampling_ratio: int = 2
    temporal_pool: str = "avg"        # | 'max'
    spatial_pool: str = "max"         # | 'avg'
    dropout: float = 0.0


class AVARoIHead(nn.Module):
    """Optionally threads a shared head between RoIAlign and the
    classifier, like mmdet FastRCNN's shared_head slot: `ACRNHead`
    (context relation) or `FBOHead` (long-term feature bank fusion —
    pass the sampled window as `lt_feat`)."""

    cfg: AVAHeadConfig
    shared_head: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, rois: jnp.ndarray,
                 *, lt_feat: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        """feats: (B, T, H, W, C); rois: (N, 5) rows
        (batch_idx, x1, y1, x2, y2) with box coords normalized to [0, 1].
        Returns multilabel logits (N, num_classes)."""
        cfg = self.cfg
        if cfg.temporal_pool == "avg":
            maps = feats.mean(axis=1)                 # (B, H, W, C)
        else:
            maps = feats.max(axis=1)
        B, H, W, C = maps.shape
        scale = jnp.asarray([W, H, W, H], jnp.float32)
        boxes = rois[:, 1:] * scale                   # to pixel coords

        # RoIAlign each roi against its batch element's map: vmap over
        # rois with a gathered per-roi map keeps everything one program.
        batch_idx = rois[:, 0].astype(jnp.int32)
        per_roi_maps = maps[batch_idx]                # (N, H, W, C)
        pooled = jax.vmap(
            lambda m, b: roi_align(m, b[None], cfg.roi_size,
                                   cfg.sampling_ratio)[0])(
            per_roi_maps, boxes)                      # (N, r, r, C)

        if self.shared_head is not None:
            roi5 = pooled[:, None]                    # (N, 1, r, r, C)
            from .lfb import ACRNHead, FBOHead        # avoid cycle
            if isinstance(self.shared_head, ACRNHead):
                roi5 = self.shared_head(roi5, maps[:, None], rois,
                                        train=train)
            elif isinstance(self.shared_head, FBOHead):
                if lt_feat is None:
                    raise ValueError("FBOHead needs lt_feat")
                roi5 = self.shared_head(roi5, lt_feat, train=train)
            else:
                roi5 = self.shared_head(roi5, train=train)
            pooled = roi5.mean(axis=1)    # (N, H', W', C') temporal collapse

        if cfg.spatial_pool == "max":
            x = pooled.max(axis=(1, 2))
        else:
            x = pooled.mean(axis=(1, 2))
        x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        return nn.Dense(cfg.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        name="fc_cls")(x)


def ava_bbox_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multilabel BCE over sigmoid scores, skipping the reserved class 0
    (bbox_head.py multilabel recipe)."""
    loss = optax.sigmoid_binary_cross_entropy(logits[:, 1:], labels[:, 1:])
    loss = loss.mean(axis=-1)
    if valid is not None:
        return (loss * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    return loss.mean()
