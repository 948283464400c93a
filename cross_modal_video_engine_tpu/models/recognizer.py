"""Video recognizers: classification and label-sequence (caption) heads.

TPU rebuild of MCT/mmaction/models/recognizers:

* `TimeSformerHead` (heads/timesformer_head.py): Dense classifier on the
  backbone CLS feature, trunc-normal init std 0.02.
* `Recognizer3D`: backbone -> head -> class scores; `average_clip`
  averages scores (or probs) over test-time clips/crops
  (recognizers/base.py:185-228).
* `Recognizer3DRelseq` (recognizers/recognizer3d_relseq.py:10-190):
  backbone -> RNNDecoderHead, teacher-forced in train, greedy-feedback at
  inference; `average_clip(..., seq_gen=True)` averages per-step probs
  over clips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .decoder_head import RNNDecoderConfig, RNNDecoderHead
from .timesformer import TimeSformer, TimeSformerConfig
from ..losses.seqmll import seq_mll_loss
from ..utils.registry import HEADS, RECOGNIZERS


@HEADS.register("TimeSformerHead")
class TimeSformerHead(nn.Module):
    num_classes: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(self.init_std),
            name="fc_cls")(x)


def average_clip(scores: jnp.ndarray, num_segs: int,
                 average_clips: Optional[str] = "prob") -> jnp.ndarray:
    """(B*num_segs, ...) -> (B, ...), mmaction base.py:185-228 semantics."""
    scores = scores.reshape((-1, num_segs) + scores.shape[1:])
    if average_clips == "prob":
        return jax.nn.softmax(scores, axis=-1).mean(axis=1)
    if average_clips == "score":
        return scores.mean(axis=1)
    if average_clips is None:
        return scores
    raise ValueError(average_clips)


class _ShuffleBase(nn.Module):
    """Common plumbing for the shuffle-contrast recognizers
    (MCT recognizer_shuffle.py:13,141,269): a TimeSformer backbone + head
    sees both the ordered clip and a frame-shuffled copy of it during
    training; each variant contrasts them differently.  Inference is the
    plain recognizer path."""

    backbone_cfg: TimeSformerConfig
    num_classes: int

    def setup(self):
        self.backbone = TimeSformer(self.backbone_cfg, name="backbone")
        self.cls_head = TimeSformerHead(self.num_classes, name="cls_head")

    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        return self.cls_head(self.backbone(videos, train=train))

    def forward_test(self, videos, num_segs: int = 1,
                     average_clips: str = "prob"):
        return average_clip(self(videos), num_segs, average_clips)


@RECOGNIZERS.register("Recognizer3DShuffleEmb")
class Recognizer3DShuffleEmb(_ShuffleBase):
    """CE on the ordered clip + cosine push-away between the ordered and
    shuffled embeddings (ce_cos_loss.py shuffle_score)."""

    margin: float = 0.5
    cos_weight: float = 0.5

    def forward_train(self, videos, shuffle_videos, labels,
                      *, train: bool = True):
        import optax
        from ..losses.shuffle import cosine_away_loss
        x = self.backbone(videos, train=train)
        sx = self.backbone(shuffle_videos, train=train)
        scores = self.cls_head(x)
        loss_cls = optax.softmax_cross_entropy_with_integer_labels(
            scores, labels).mean()
        loss_cos = self.cos_weight * cosine_away_loss(x, sx, self.margin)
        return {"loss_cls": loss_cls, "loss_cos": loss_cos,
                "loss": loss_cls + loss_cos}


@RECOGNIZERS.register("Recognizer3DShuffleSoft")
class Recognizer3DShuffleSoft(_ShuffleBase):
    """CE on the ordered clip + soft-label CE on the shuffled clip's
    scores — shuffled clips are supervised to be LESS confident
    (ce_soft_loss.py)."""

    margin: float = 0.5
    soft_weight: float = 0.5

    def forward_train(self, videos, shuffle_videos, labels,
                      *, train: bool = True):
        import optax
        from ..losses.shuffle import soft_cross_entropy, soft_label_smooth
        scores = self.cls_head(self.backbone(videos, train=train))
        sscores = self.cls_head(self.backbone(shuffle_videos, train=train))
        loss_cls = optax.softmax_cross_entropy_with_integer_labels(
            scores, labels).mean()
        soft = soft_label_smooth(labels, self.num_classes, self.margin)
        loss_soft = self.soft_weight * soft_cross_entropy(sscores, soft)
        return {"loss_cls": loss_cls, "loss_soft": loss_soft,
                "loss": loss_cls + loss_soft}


@RECOGNIZERS.register("Recognizer3DShuffleExtra")
class Recognizer3DShuffleExtra(_ShuffleBase):
    """Shuffled clips become their own EXTRA class: the head has
    num_classes + 1 outputs and shuffled clips are labeled with the last
    one (recognizer_shuffle.py:289-297 — the reference hardcodes 400 on a
    401-way K400 head).  Construct with num_classes = real classes + 1."""

    def forward_train(self, videos, shuffle_videos, labels,
                      *, train: bool = True):
        import optax
        scores = self.cls_head(self.backbone(videos, train=train))
        sscores = self.cls_head(self.backbone(shuffle_videos, train=train))
        shuffle_labels = jnp.full((sscores.shape[0],), self.num_classes - 1,
                                  labels.dtype)
        all_scores = jnp.concatenate([scores, sscores])
        all_labels = jnp.concatenate([labels, shuffle_labels])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            all_scores, all_labels).mean()
        return {"loss_cls": loss, "loss": loss}


@RECOGNIZERS.register("BackboneClassifier")
class BackboneClassifier(nn.Module):
    """Recognizer3D for the conv backbones (ResNet3D / SlowFast / X3D):
    backbone global-pooled feature -> I3DHead-style classifier.

    Unlike the TimeSformer recognizer (whose position embeddings fix the
    input shape), conv backbones accept any (T, H, W) — this is the model
    the multigrid schedule (train/multigrid.py) trains, mirroring the
    reference's SlowFast-multigrid pairing
    (MCT/mmaction/utils/multigrid/longshortcyclehook.py).
    """

    backbone: nn.Module
    num_classes: int
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        """videos: (B, T, H, W, 3) -> class scores (B, num_classes)."""
        from .heads import I3DHead
        feat = self.backbone(videos, train=train)
        return I3DHead(self.num_classes, self.dropout_ratio,
                       name="cls_head")(feat, train=train)

    def forward_test(self, videos: jnp.ndarray, num_segs: int = 1,
                     average_clips: str = "prob"):
        scores = self(videos)
        return average_clip(scores, num_segs, average_clips)


@RECOGNIZERS.register("Recognizer3D")
class Recognizer3D(nn.Module):
    backbone_cfg: TimeSformerConfig
    num_classes: int

    def setup(self):
        self.backbone = TimeSformer(self.backbone_cfg, name="backbone")
        self.cls_head = TimeSformerHead(self.num_classes, name="cls_head")

    def extract_feat(self, videos, *, train: bool = False):
        return self.backbone(videos, train=train)

    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        """videos: (B, T, H, W, 3) -> class scores (B, num_classes)."""
        feat = self.backbone(videos, train=train)
        return self.cls_head(feat)

    def forward_test(self, videos: jnp.ndarray, num_segs: int = 1,
                     average_clips: str = "prob"):
        scores = self(videos)
        return average_clip(scores, num_segs, average_clips)

    # -- explainability surface (torch-hook replacement) -------------------
    def forward_with_capture(self, videos, layers):
        """Class scores + captured token sequences at `layers`."""
        feat, captured = self.backbone(videos, capture_layers=tuple(layers))
        return self.cls_head(feat), captured

    def score_from_layer(self, tokens, layer: int):
        """Class scores recomputed from layer `layer` tokens (grad target)."""
        feat = self.backbone.forward_from(tokens, layer)
        return self.cls_head(feat)


@RECOGNIZERS.register("Recognizer2D")
class Recognizer2D(nn.Module):
    """2D recognizer: per-frame backbone (e.g. TSMResNet) emitting
    (B, num_segs, C) features + a consensus head (TSNHead).  Mirrors
    mmaction Recognizer2D's segment folding."""

    backbone: nn.Module
    cls_head: nn.Module

    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        feats = self.backbone(videos, train=train)      # (B, T, C)
        return self.cls_head(feats, train=train)

    def forward_test(self, videos: jnp.ndarray,
                     average_clips: str = "prob"):
        scores = self(videos)
        if average_clips == "prob":
            return jax.nn.softmax(scores, axis=-1)
        return scores


@RECOGNIZERS.register("Recognizer3DCLIP")
class Recognizer3DCLIP(nn.Module):
    """Recognition over a CLIP vision tower (ref Recognizer3D_CLIP):
    frame features from the tower, mean-pooled over time, linear head."""

    clip_vision: nn.Module
    num_classes: int

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        B, T = videos.shape[0], videos.shape[1]
        flat = videos.reshape((B * T,) + videos.shape[2:])
        high, _low, _mid = self.clip_vision(flat)
        feat = high.reshape(B, T, -1).mean(axis=1)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        name="fc_cls")(feat)


@RECOGNIZERS.register("Recognizer3DCaption")
class Recognizer3DCaption(nn.Module):
    """Video backbone + token-level caption transformer (north-star
    autoregressive captioning with KV cache + greedy/beam)."""

    backbone_cfg: "TimeSformerConfig"
    caption_cfg: "object"   # CaptionConfig

    def setup(self):
        from .caption_transformer import CaptionTransformer
        self.backbone = TimeSformer(self.backbone_cfg, name="backbone")
        self.caption_head = CaptionTransformer(self.caption_cfg,
                                               name="caption_head")

    def _enc_tokens(self, videos, train=False):
        _, tokens = self.backbone(videos, train=train, return_tokens=True)
        return tokens

    def __call__(self, videos, token_ids, *, train: bool = False):
        """Teacher forcing: returns (B, T, vocab) logits."""
        enc = self._enc_tokens(videos, train)
        return self.caption_head(enc, token_ids, mode="train")

    def generate(self, videos, mode: str = "greedy", beam_width: int = 4):
        enc = self._enc_tokens(videos)
        return self.caption_head(enc, None, mode=mode,
                                 beam_width=beam_width)


@RECOGNIZERS.register("Recognizer3DRelseq")
class Recognizer3DRelseq(nn.Module):
    backbone_cfg: TimeSformerConfig
    decoder_cfg: RNNDecoderConfig

    def setup(self):
        self.backbone = TimeSformer(self.backbone_cfg, name="backbone")
        self.cls_head = RNNDecoderHead(self.decoder_cfg, name="cls_head")

    def extract_feat(self, videos, *, train: bool = False):
        return self.backbone(videos, train=train)

    def __call__(self, videos: jnp.ndarray,
                 targets_emb: Optional[jnp.ndarray] = None,
                 mode: str = "inference", *, train: bool = False):
        feat = self.backbone(videos, train=train)
        return self.cls_head(feat, targets_emb, mode=mode, train=train)

    def forward_train(self, videos, targets_emb, mask):
        """Returns the SeqMLL loss (recognizer3d_relseq.py:75-91)."""
        probs = self(videos, targets_emb, mode="train", train=True)
        return seq_mll_loss(probs, targets_emb, mask)

    def forward_test(self, videos: jnp.ndarray, num_segs: int = 1):
        """Greedy decode averaged over clips (seq_gen average, base.py:
        185-228 + recognizer3d_relseq.py _do_test)."""
        probs = self(videos, mode="inference")
        probs = probs.reshape((-1, num_segs) + probs.shape[1:]).mean(axis=1)
        return probs


@RECOGNIZERS.register("RecognizerRelseq")
class RecognizerRelseq(nn.Module):
    """Backbone-agnostic label-sequence recognizer: any module producing a
    pooled (B, D) feature drives the RNN decoder head — the reference's
    seq_generate family covers i3d/mvit/slowfast/timesformer/videomae/x3d
    backbones with the same head (MCT/configs/seq_generate/)."""

    backbone: nn.Module
    decoder_cfg: RNNDecoderConfig

    def setup(self):
        self.cls_head = RNNDecoderHead(self.decoder_cfg, name="cls_head")

    def extract_feat(self, videos, *, train: bool = False):
        return self.backbone(videos, train=train)

    def __call__(self, videos: jnp.ndarray,
                 targets_emb: Optional[jnp.ndarray] = None,
                 mode: str = "inference", *, train: bool = False):
        feat = self.backbone(videos, train=train)
        return self.cls_head(feat, targets_emb, mode=mode, train=train)

    def forward_train(self, videos, targets_emb, mask):
        probs = self(videos, targets_emb, mode="train", train=True)
        return seq_mll_loss(probs, targets_emb, mask)

    def forward_test(self, videos: jnp.ndarray, num_segs: int = 1):
        probs = self(videos, mode="inference")
        probs = probs.reshape((-1, num_segs) + probs.shape[1:]).mean(axis=1)
        return probs


@RECOGNIZERS.register("X3DClassifier")
class X3DClassifier(nn.Module):
    """X3D backbone + the reference's two-layer X3DHead (fc1 -> relu ->
    dropout -> fc2), the checkpoint contract of mmaction's x3d configs."""

    backbone: nn.Module
    num_classes: int
    mid_channels: int = 2048
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False):
        from .heads import X3DHead
        feat = self.backbone(videos, train=train)
        return X3DHead(self.num_classes, self.mid_channels,
                       self.dropout_ratio, name="cls_head")(feat,
                                                            train=train)

    def forward_test(self, videos: jnp.ndarray, num_segs: int = 1,
                     average_clips: str = "prob"):
        return average_clip(self(videos), num_segs, average_clips)


@RECOGNIZERS.register("TPNRecognizer")
class TPNRecognizer(nn.Module):
    """Recognizer3D with the TPN neck between backbone stages and the
    classifier (the configs/recognition/tpn family: ResNet3dSlowOnly
    out_indices=(2, 3) -> TPN -> TPNHead; tpn_slowonly_r50.py).

    The backbone must expose stage maps via ``return_stages=True``
    (ResNet3D family); the neck consumes the last
    len(tpn_cfg.in_channels) stages and the head global-pools the fused
    pyramid (TPNHead = TSNHead-over-3D-pool, heads/tpn_head.py).
    Training returns (scores, aux) so the TPN auxiliary CE joins the
    loss like the reference's loss_aux."""

    backbone: nn.Module
    tpn_cfg: "object"
    num_classes: int
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, videos: jnp.ndarray, *, train: bool = False,
                 target: Optional[jnp.ndarray] = None):
        from .tpn import TPN
        stages = self.backbone(videos, train=train, return_stages=True)
        n = len(self.tpn_cfg.in_channels)
        feat, aux = TPN(self.tpn_cfg, name="neck")(
            stages[-n:], train=train, target=target)
        x = feat.mean(axis=(1, 2, 3))                 # 3D global pool
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        scores = nn.Dense(self.num_classes,
                          kernel_init=nn.initializers.normal(0.01),
                          name="cls_head")(x)
        if train:
            return scores, aux
        return scores

    def forward_test(self, videos: jnp.ndarray, num_segs: int = 1,
                     average_clips: str = "prob"):
        return average_clip(self(videos), num_segs, average_clips)
