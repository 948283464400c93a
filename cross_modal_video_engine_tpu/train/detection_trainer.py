"""AVA spatio-temporal action-detection training (FastRCNN-equivalent).

TPU rebuild of the reference detection stack the `configs/detection/ava/`
family drives: mmdet `FastRCNN` over a `ResNet3dSlowOnly` backbone with
an `AVARoIHead`/`BBoxHeadAVA` (see
MCT/configs/detection/ava/slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py:1-42
and MCT/mmaction/models/heads/bbox_head.py:34-118).  Everything is
static-shape: each keyframe contributes exactly `max_boxes` RoIs (zero-
padded, masked by `valid`), so one XLA program covers every batch.

Proposal assignment mirrors the reference `train_cfg.rcnn`
(MaxIoUAssignerAVA pos_iou_thr=0.9 + add_gt_as_proposals=True): a
proposal becomes a positive with the labels of its argmax-IoU GT box
when that IoU >= pos_iou_thr, otherwise a background row (all-zero
multilabel target); GT boxes are always appended as proposals.  When no
external proposal file exists, training runs on the GT boxes alone —
equivalent to add_gt_as_proposals with an empty proposal list.

Evaluation follows the AVA protocol end-to-end: sigmoid action scores
per RoI, `action_thr` filtering (test_cfg.rcnn.action_thr=0.002), and
frame-mAP@0.5 via metrics.ava (the results2csv/ava_eval equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..metrics.ava import ava_frame_map, make_image_key
from ..models.ava_head import AVAHeadConfig, AVARoIHead, ava_bbox_loss


class AVAFastRCNN(nn.Module):
    """Backbone feature maps -> RoI head logits.

    The backbone must expose spatial maps via ``return_stages=True``
    (the ResNet3D family does); the last stage feeds the RoI head like
    SingleRoIExtractor3D consumes the SlowOnly C5 map.  `shared_head`
    (ACRNHead / FBOHead) slots between RoIAlign and the classifier
    like mmdet FastRCNN's shared_head; FBO configs must pass the
    sampled long-term window as `lt_feat`.
    """

    backbone: nn.Module
    head_cfg: AVAHeadConfig
    shared_head: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, clips: jnp.ndarray, rois: jnp.ndarray,
                 *, lt_feat: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        feats = self.backbone(clips, train=train, return_stages=True)[-1]
        return AVARoIHead(self.head_cfg, self.shared_head,
                          name="roi_head")(
            feats, rois, lt_feat=lt_feat, train=train)


# ---------------------------------------------------------------------------
# host-side proposal assignment + static batch packing
# ---------------------------------------------------------------------------

def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of [x1,y1,x2,y2] boxes."""
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * \
        np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * \
        np.clip(b[:, 3] - b[:, 1], 0, None)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(union > 0, inter / union, 0.0)


def assign_proposals(proposals: np.ndarray, gt_boxes: np.ndarray,
                     gt_labels: np.ndarray, num_classes: int,
                     pos_iou_thr: float = 0.9,
                     add_gt_as_proposals: bool = True):
    """MaxIoUAssignerAVA + RandomSampler(add_gt_as_proposals) semantics.

    proposals (P, 4) / gt_boxes (G, 4) normalized x1y1x2y2; gt_labels
    (G, num_classes) multilabel.  Returns (boxes (N, 4),
    labels (N, num_classes)): positives carry their matched GT's
    labels, negatives an all-zero row.
    """
    proposals = np.asarray(proposals, np.float32).reshape(-1, 4)
    gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
    gt_labels = np.asarray(gt_labels, np.float32).reshape(
        -1, num_classes)
    rows_b: List[np.ndarray] = []
    rows_l: List[np.ndarray] = []
    if add_gt_as_proposals and len(gt_boxes):
        rows_b.append(gt_boxes)
        rows_l.append(gt_labels)
    if len(proposals):
        if len(gt_boxes):
            iou = _iou_xyxy(proposals, gt_boxes)
            best = iou.argmax(axis=1)
            pos = iou[np.arange(len(proposals)), best] >= pos_iou_thr
            lab = np.zeros((len(proposals), num_classes), np.float32)
            lab[pos] = gt_labels[best[pos]]
        else:
            lab = np.zeros((len(proposals), num_classes), np.float32)
        rows_b.append(proposals)
        rows_l.append(lab)
    if not rows_b:
        return (np.zeros((0, 4), np.float32),
                np.zeros((0, num_classes), np.float32))
    return np.concatenate(rows_b), np.concatenate(rows_l)


def pack_detection_batch(items: Sequence[Dict], max_boxes: int,
                         num_classes: int):
    """items: dicts with 'clip' (T, H, W, 3) float, 'boxes' (n, 4)
    normalized x1y1x2y2, 'labels' (n, num_classes).  Returns
    (clips (B,T,H,W,3), rois (B*max_boxes, 5), labels, valid) with the
    static-roi layout the jitted step expects."""
    clips = np.stack([np.asarray(it["clip"], np.float32) for it in items])
    B = len(items)
    rois = np.zeros((B * max_boxes, 5), np.float32)
    labels = np.zeros((B * max_boxes, num_classes), np.float32)
    valid = np.zeros((B * max_boxes,), np.float32)
    for b, it in enumerate(items):
        boxes = np.asarray(it["boxes"], np.float32).reshape(-1, 4)
        labs = np.asarray(it["labels"], np.float32).reshape(
            -1, num_classes)
        n = min(len(boxes), max_boxes)
        sl = slice(b * max_boxes, b * max_boxes + n)
        rois[sl, 0] = b
        rois[sl, 1:] = boxes[:n]
        labels[sl] = labs[:n]
        valid[sl] = 1.0
    return clips, rois, labels, valid


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------

class DetTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_det_train_step(model: AVAFastRCNN, tx):
    """BatchNorm-threaded detection train step (the ResNet3D backbone
    carries batch_stats)."""

    def loss_fn(params, stats, clips, rois, labels, valid, rng, lt_feat):
        logits, new = model.apply(
            {"params": params, "batch_stats": stats}, clips, rois,
            lt_feat=lt_feat, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        loss = ava_bbox_loss(logits, labels, valid)
        # multilabel recall@0.5 over valid positive rows, a cheap
        # train-progress signal like the reference's recall logging
        probs = jax.nn.sigmoid(logits[:, 1:])
        hit = ((probs > 0.5) == (labels[:, 1:] > 0.5)).mean(axis=-1)
        acc = (hit * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return loss, (acc, new["batch_stats"])

    def step(state: DetTrainState, stats, clips, rois, labels, valid, rng,
             lt_feat=None):
        (loss, (acc, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, stats, clips, rois,
                                   labels, valid, rng, lt_feat)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (DetTrainState(params, opt_state, state.step + 1), stats,
                {"loss": loss, "label_acc": acc})

    return jax.jit(step)


def make_det_infer(model: AVAFastRCNN):
    """Jitted sigmoid action scores per RoI (eval mode, running BN)."""

    def infer(params, stats, clips, rois, lt_feat=None):
        logits = model.apply({"params": params, "batch_stats": stats},
                             clips, rois, lt_feat=lt_feat, train=False)
        return jax.nn.sigmoid(logits)

    return jax.jit(infer)


# ---------------------------------------------------------------------------
# long-term feature bank construction (LFBInferHead equivalent)
# ---------------------------------------------------------------------------

def make_st_feature_fn(model: AVAFastRCNN):
    """Jitted short-term RoI feature extractor: backbone maps ->
    RoIAlign -> temporal-avg + spatial-max pooled vectors (N, C) — the
    exact features LFBInferHead stores (lfb_infer_head.py:75-88)."""
    from ..models.ava_head import roi_align
    cfg = model.head_cfg

    def fn(params, stats, clips, rois):
        feats = model.apply(
            {"params": params, "batch_stats": stats}, clips,
            method=lambda m, c: m.backbone(c, train=False,
                                           return_stages=True))[-1]
        maps = (feats.mean(axis=1) if cfg.temporal_pool == "avg"
                else feats.max(axis=1))
        B, H, W, C = maps.shape
        scale = jnp.asarray([W, H, W, H], jnp.float32)
        boxes = rois[:, 1:] * scale
        per_roi = maps[rois[:, 0].astype(jnp.int32)]
        pooled = jax.vmap(
            lambda m, b: roi_align(m, b[None], cfg.roi_size,
                                   cfg.sampling_ratio)[0])(per_roi, boxes)
        return (pooled.max(axis=(1, 2)) if cfg.spatial_pool == "max"
                else pooled.mean(axis=(1, 2)))

    return jax.jit(fn)


def build_lfb(model: AVAFastRCNN, params, stats, batches: Iterable[Dict],
              capacity: int = 5, seed: int = 0):
    """Run the bank-building inference pass over keyframe batches (with
    meta) and return a LongTermFeatureBank.  Replaces the reference's
    infer-then-pickle flow (lfb_infer_head.py:90-148) with an explicit
    function returning the device-resident bank."""
    from ..models.lfb import LFBBuilder
    fn = make_st_feature_fn(model)
    builder: Optional[LFBBuilder] = None
    for batch in batches:
        st = np.asarray(fn(params, stats, batch["clips"], batch["rois"]))
        if builder is None:
            builder = LFBBuilder(st.shape[-1], capacity)
        max_boxes = batch["rois"].shape[0] // batch["clips"].shape[0]
        for b in range(len(batch["video_id"])):
            sl = slice(b * max_boxes, (b + 1) * max_boxes)
            n = int(batch["valid"][sl].sum())
            if n:
                builder.add(batch["video_id"][b], batch["timestamp"][b],
                            st[sl][:n])
    if builder is None:
        raise ValueError("no batches to build LFB from")
    return builder.build(seed)


def sample_lt_features(bank, video_ids: Sequence[str],
                       timestamps: Sequence, max_boxes: int,
                       window_size: int = 60,
                       batch_size: Optional[int] = None) -> np.ndarray:
    """Per-RoI long-term windows for a packed batch: each of the B
    keyframes' `max_boxes` RoIs shares its keyframe's window
    (fbo_head.py:374-384).  Unknown videos get a zero window; padded
    tail keyframes (batch_size > len(video_ids)) get zero rows."""
    vidx = np.asarray([bank.video_index.get(v, -1) for v in video_ids])
    ts = np.asarray([int(t) for t in timestamps])
    lt = np.array(bank.sample_batch(np.maximum(vidx, 0), ts,
                                    window_size))
    lt[vidx < 0] = 0.0
    lt = np.repeat(lt, max_boxes, axis=0)        # (n*max_boxes, L, C)
    B = batch_size or len(video_ids)
    if B > len(video_ids):
        pad = np.zeros(((B - len(video_ids)) * max_boxes,) + lt.shape[1:],
                       lt.dtype)
        lt = np.concatenate([lt, pad])
    return lt


# ---------------------------------------------------------------------------
# AVA-protocol evaluation
# ---------------------------------------------------------------------------

def detection_results(scores: np.ndarray, boxes: np.ndarray,
                      n_valid: int, num_classes: int,
                      action_thr: float = 0.002) -> List[np.ndarray]:
    """Per-keyframe sigmoid scores (N, num_classes) + boxes (N, 4)
    -> the reference's per-class result list (label l-1 holds action
    id l): each entry (k, 5) [x1, y1, x2, y2, score] with
    score >= action_thr (bbox_head.py get_det_bboxes + test_cfg
    action_thr)."""
    out: List[np.ndarray] = []
    boxes = np.asarray(boxes)[:n_valid]
    scores = np.asarray(scores)[:n_valid]
    for c in range(1, num_classes):
        keep = scores[:, c] >= action_thr
        out.append(np.concatenate(
            [boxes[keep], scores[keep, c:c + 1]], axis=1)
            if keep.any() else np.zeros((0, 5), np.float32))
    return out


def evaluate_ava_detection(infer, params, stats, batches: Iterable[Dict],
                           num_classes: int,
                           action_thr: float = 0.002,
                           bank=None, window_size: int = 60
                           ) -> Dict[str, float]:
    """Run inference over val keyframes and score frame-mAP@0.5.

    batches yield dicts: clips/rois/valid (packed), plus per-item
    metadata lists 'video_id', 'timestamp', 'gt_boxes' (n, 4 x1y1x2y2),
    'gt_labels' (n, num_classes).  Returns the ava_frame_map dict plus
    'mAP@0.5IOU' as the headline key.
    """
    det_boxes: Dict[str, List] = {}
    det_labels: Dict[str, List] = {}
    det_scores: Dict[str, List] = {}
    gt_boxes_d: Dict[str, List] = {}
    gt_labels_d: Dict[str, List] = {}
    for batch in batches:
        max_boxes = batch["rois"].shape[0] // batch["clips"].shape[0]
        lt = None
        if bank is not None:
            lt = sample_lt_features(bank, batch["video_id"],
                                    batch["timestamp"], max_boxes,
                                    window_size, batch["clips"].shape[0])
        scores = np.asarray(infer(params, stats, batch["clips"],
                                  batch["rois"], lt))
        for b in range(batch["clips"].shape[0]):
            if b >= len(batch["video_id"]):
                break
            key = make_image_key(batch["video_id"][b],
                                 batch["timestamp"][b])
            sl = slice(b * max_boxes, (b + 1) * max_boxes)
            n = int(batch["valid"][sl].sum())
            db, dl, ds = det_boxes.setdefault(key, []), \
                det_labels.setdefault(key, []), \
                det_scores.setdefault(key, [])
            # one copy of the per-class action_thr filtering (shared
            # with detection_test.py via detection_results)
            per_class = detection_results(scores[sl],
                                          batch["rois"][sl][:, 1:],
                                          n, num_classes, action_thr)
            for c, dets in enumerate(per_class, start=1):
                for x1, y1, x2, y2, s in dets:
                    db.append([y1, x1, y2, x2])   # AVA eval convention
                    dl.append(c)
                    ds.append(float(s))
            gb, gl = gt_boxes_d.setdefault(key, []), \
                gt_labels_d.setdefault(key, [])
            for i, box in enumerate(np.asarray(
                    batch["gt_boxes"][b]).reshape(-1, 4)):
                labs = np.nonzero(np.asarray(
                    batch["gt_labels"][b]).reshape(
                        -1, num_classes)[i] > 0.5)[0]
                for c in labs:
                    if c == 0:
                        continue
                    x1, y1, x2, y2 = box
                    gb.append([y1, x1, y2, x2])
                    gl.append(int(c))
    metrics = ava_frame_map(gt_boxes_d, gt_labels_d, det_boxes,
                            det_labels, det_scores,
                            class_ids=range(1, num_classes))
    metrics["mAP@0.5IOU"] = metrics["PascalBoxes_Precision/mAP@0.5IOU"]
    return metrics
