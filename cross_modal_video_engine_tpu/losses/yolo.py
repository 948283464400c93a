"""YOLOv5 training loss — TPU-native, fully static shapes.

Rebuild of the reference detector's training criterion
(MCT/yolov5/utils/loss.py: ComputeLoss.__call__ :121-175,
build_targets :177-234; CIoU from MCT/yolov5/utils/metrics.py
bbox_iou :222-260).

The reference builds a *variable-length* list of positive candidates by
boolean filtering (anchor-ratio match, then the 3-cell offset
expansion).  Under XLA every shape must be static, so the assignment is
dense instead: every (offset, anchor, target-slot) triple is a
candidate with a validity mask, and the three reductions
(box / cls masked means, objectness scatter) are computed with the mask
rather than by gathering a filtered subset.  Semantics are otherwise
identical:

* anchor match: max(wh/anchor, anchor/wh) < anchor_t   (loss.py:205-208)
* offset expansion: the cell itself plus the left/top/right/bottom
  neighbour whose fractional center coordinate is < 0.5 (loss.py:210-217)
* box loss: 1 - CIoU of the decoded prediction vs the cell-relative
  target box (loss.py:137-142)
* objectness target: the detached, clamped CIoU scattered into the
  grid (loss.py:144-151).  Where the reference's duplicate writes are
  order-dependent (last write wins in an unspecified order), we take
  the *max* over duplicates — deterministic, and equal whenever a cell
  has a single owner.
* class loss: BCE-with-logits against label-smoothed one-hot targets
  (loss.py:153-157), only when num_classes > 1
* per-layer objectness balance [4.0, 1.0, 0.4] and the final
  (box+obj+cls) * batch_size scaling (loss.py:112, 163-175).

Targets arrive padded per image: (B, T, 5) rows of
[class, cx, cy, w, h] in 0-1 normalized coordinates with a (B, T)
validity mask — the static-shape analogue of the reference's
(image, class, x, y, w, h) row list.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class YoloHyp(NamedTuple):
    """The loss-relevant subset of hyp.scratch-low.yaml (:6-21), after
    the train.py:234-237 layer/class/image-size scaling has been
    applied by the caller (see `scale_hyp`)."""
    box: float = 0.05
    cls: float = 0.5
    obj: float = 1.0
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    label_smoothing: float = 0.0


def scale_hyp(hyp: YoloHyp, *, nl: int, nc: int, imgsz: int) -> YoloHyp:
    """train.py:233-237 — scale loss gains to layers/classes/resolution."""
    return hyp._replace(
        box=hyp.box * 3.0 / nl,
        cls=hyp.cls * nc / 80.0 * 3.0 / nl,
        obj=hyp.obj * (imgsz / 640.0) ** 2 * 3.0 / nl,
    )


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    """loss.py:13-15 — positive/negative label-smoothing BCE targets."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bbox_ciou(box1: jnp.ndarray, box2: jnp.ndarray,
              eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU of xywh boxes (metrics.py bbox_iou:222-256, CIoU).

    box1, box2: (..., 4) center-size boxes; broadcasting allowed.
    """
    x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
    x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
    b1x1, b1x2 = x1 - w1 / 2, x1 + w1 / 2
    b1y1, b1y2 = y1 - h1 / 2, y1 + h1 / 2
    b2x1, b2x2 = x2 - w2 / 2, x2 + w2 / 2
    b2y1, b2y2 = y2 - h2 / 2, y2 + h2 / 2

    inter = (jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
             * jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
            + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4.0
    v = (4.0 / math.pi ** 2) * (jnp.arctan(w2 / (h2 + eps))
                                - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1.0 + eps)))
    return jnp.squeeze(iou - (rho2 / c2 + v * alpha), axis=-1)


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                pos_weight: float) -> jnp.ndarray:
    """Elementwise nn.BCEWithLogitsLoss(pos_weight=·) (loss.py:100-101)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


class LayerTargets(NamedTuple):
    """Dense per-layer assignment: K = 5 offsets * na anchors * B*T
    target slots, flattened.  `mask` marks real positives."""
    b: jnp.ndarray        # (K,) image index
    a: jnp.ndarray        # (K,) anchor index
    gj: jnp.ndarray       # (K,) grid row  (clamped)
    gi: jnp.ndarray       # (K,) grid col  (clamped)
    tbox: jnp.ndarray     # (K, 4) cell-relative xy + grid-space wh
    tcls: jnp.ndarray     # (K,) class index
    anch: jnp.ndarray     # (K, 2) matched anchor wh (grid units)
    mask: jnp.ndarray     # (K,) bool validity


# np, not jnp: a module-level jnp.asarray would initialize the JAX
# backend (the axon TPU client) in any process that merely imports this
# module; numpy constants convert at trace time instead.
_OFFSETS = np.asarray(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]],
    np.float32)  # :186-195


def build_targets(targets: jnp.ndarray, valid: jnp.ndarray,
                  anchors: Sequence[Sequence[Tuple[float, float]]],
                  strides: Sequence[int],
                  grid_shapes: Sequence[Tuple[int, int]],
                  anchor_t: float = 4.0) -> List[LayerTargets]:
    """Static-shape build_targets (loss.py:177-234).

    targets: (B, T, 5) [class, cx, cy, w, h] normalized 0-1
    valid:   (B, T) bool
    anchors: per layer (na, 2) in *pixels*; divided by stride here to
             grid units (the reference stores them pre-divided,
             models/yolo.py Detect).
    grid_shapes: per layer (H, W).
    """
    B, T, _ = targets.shape
    nt = B * T
    flat = targets.reshape(nt, 5)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), T)
    vflat = valid.reshape(nt)
    g = 0.5

    out: List[LayerTargets] = []
    for anc, stride, (H, W) in zip(anchors, strides, grid_shapes):
        anc = jnp.asarray(anc, jnp.float32) / float(stride)    # (na, 2)
        na = anc.shape[0]
        gain = jnp.asarray([W, H], jnp.float32)
        gxy = flat[:, 1:3] * gain                               # (nt, 2)
        gwh = flat[:, 3:5] * gain

        # anchor-ratio match (loss.py:205-208)
        r = gwh[None, :, :] / anc[:, None, :]                   # (na, nt, 2)
        amatch = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t

        # neighbour-cell expansion (loss.py:210-217)
        jk = (jnp.mod(gxy, 1.0) < g) & (gxy > 1.0)              # (nt, 2)
        lm = (jnp.mod(gain - gxy, 1.0) < g) & ((gain - gxy) > 1.0)
        off_ok = jnp.stack([jnp.ones_like(jk[:, 0]), jk[:, 0], jk[:, 1],
                            lm[:, 0], lm[:, 1]])                # (5, nt)

        mask = (vflat[None, None, :] & amatch[None, :, :]
                & off_ok[:, None, :])                           # (5, na, nt)

        gij = jnp.floor(gxy[None, :, :] - _OFFSETS[:, None, :] * g)
        gi = jnp.clip(gij[..., 0].astype(jnp.int32), 0, W - 1)  # (5, nt)
        gj = jnp.clip(gij[..., 1].astype(jnp.int32), 0, H - 1)
        # tbox xy is relative to the *clamped* cell, like the reference
        # (clamp_ mutates gij in place before the tbox append, :229-230)
        txy = gxy[None, :, :] - jnp.stack([gi, gj], -1).astype(jnp.float32)

        K = 5 * na * nt
        bcast = lambda x: jnp.broadcast_to(x, (5, na, nt)).reshape(K)
        out.append(LayerTargets(
            b=bcast(bidx[None, None, :]),
            a=bcast(jnp.arange(na, dtype=jnp.int32)[None, :, None]),
            gj=bcast(gj[:, None, :]),
            gi=bcast(gi[:, None, :]),
            tbox=jnp.concatenate(
                [jnp.broadcast_to(txy[:, None, :, :], (5, na, nt, 2)),
                 jnp.broadcast_to(gwh[None, None, :, :], (5, na, nt, 2))],
                -1).reshape(K, 4),
            tcls=bcast(flat[None, None, :, 0].astype(jnp.int32)),
            anch=jnp.broadcast_to(anc[None, :, None, :],
                                  (5, na, nt, 2)).reshape(K, 2),
            mask=mask.reshape(K),
        ))
    return out


BALANCE3 = (4.0, 1.0, 0.4)   # P3-P5 objectness balance (loss.py:112)


def yolo_loss(raw_maps: Sequence[jnp.ndarray], targets: jnp.ndarray,
              valid: jnp.ndarray,
              anchors: Sequence[Sequence[Tuple[float, float]]],
              strides: Sequence[int] = (8, 16, 32),
              hyp: YoloHyp = YoloHyp(),
              num_classes: int = 80) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """ComputeLoss.__call__ (loss.py:121-175).

    raw_maps: per layer (B, H, W, na*(5+nc)) raw detector outputs
              (channels-last; the reference's (B, na, H, W, no)).
    Returns (total_loss, {'box','obj','cls'}) where total is
    (lbox + lobj + lcls) * B and the items are the unscaled-by-B gains,
    matching the reference's return pair.
    """
    return _yolo_loss_impl(raw_maps, targets, valid, anchors, strides,
                           hyp, num_classes)


def yolo_seg_loss(raw_maps: Sequence[jnp.ndarray], proto: jnp.ndarray,
                  targets: jnp.ndarray, valid: jnp.ndarray,
                  gt_masks: jnp.ndarray,
                  anchors: Sequence[Sequence[Tuple[float, float]]],
                  strides: Sequence[int] = (8, 16, 32),
                  hyp: YoloHyp = YoloHyp(), num_classes: int = 80,
                  nm: int = 32, mask_cap: int = 128
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Segmentation criterion (utils/segment/loss.py ComputeLoss
    :45-110, non-overlap mode): the detection losses over maps with
    5+nc+nm channels per anchor, plus the per-image prototype-mask BCE
    `single_mask_loss` (:112-116) — pred_mask = coefs @ protos, BCE vs
    the per-target GT mask, cropped to the (normalized-xywh-scaled)
    target box, pixel-mean / box-area, averaged over the image's
    positives and summed over images and layers with gain
    hyp.box / B (:104-108).

    proto:    (B, Hm, Wm, nm) prototype maps (stride 4).
    gt_masks: (B, T, Hm, Wm) per-target binary masks at proto
              resolution (the reference trains with mask_ratio=4,
              segment/train.py --mask-ratio, and nearest-downsamples
              inside the loss :88-89 — here the dataset rasterizes at
              proto resolution directly).
    mask_cap: static cap on mask-loss candidates per image per layer
              (XLA shapes must be static where the reference gathers a
              filtered subset).  Positives beyond the cap fall out of
              the mask term only; `items['seg_dropped']` counts them —
              each target contributes at most 3 cells x na anchors, so
              cap >= 3*na*(real targets per image) loses nothing.
    """
    return _yolo_loss_impl(raw_maps, targets, valid, anchors, strides,
                           hyp, num_classes, proto=proto,
                           gt_masks=gt_masks, nm=nm, mask_cap=mask_cap)


def _yolo_loss_impl(raw_maps, targets, valid, anchors, strides, hyp,
                    num_classes, proto=None, gt_masks=None, nm=0,
                    mask_cap=0):
    nc = num_classes
    cp, cn = smooth_bce(hyp.label_smoothing)
    B, T, _ = targets.shape
    grid_shapes = [(m.shape[1], m.shape[2]) for m in raw_maps]
    tl = build_targets(targets, valid, anchors, strides, grid_shapes,
                       hyp.anchor_t)
    seg = proto is not None
    no = 5 + nc + (nm if seg else 0)

    lbox = jnp.zeros(())
    lobj = jnp.zeros(())
    lcls = jnp.zeros(())
    lseg = jnp.zeros(())
    dropped = jnp.zeros((), jnp.int32)
    for i, (pi, t) in enumerate(zip(raw_maps, tl)):
        Bi, H, W, _ = pi.shape
        pi = pi.reshape(Bi, H, W, -1, no)                     # (B,H,W,na,no)
        na = pi.shape[3]
        pred = pi[t.b, t.gj, t.gi, t.a]                       # (K, no)
        m = t.mask.astype(pred.dtype)
        n = jnp.maximum(jnp.sum(m), 1.0)

        # Regression (loss.py:137-142)
        pxy = jax.nn.sigmoid(pred[:, :2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(pred[:, 2:4]) * 2.0) ** 2 * t.anch
        pbox = jnp.concatenate([pxy, pwh], -1)
        iou = bbox_ciou(pbox, t.tbox)                         # (K,)
        lbox = lbox + jnp.sum((1.0 - iou) * m) / n

        # Objectness target (loss.py:144-151); duplicate cells resolve
        # by max (see module docstring).
        iou_det = jnp.clip(jax.lax.stop_gradient(iou), 0.0) * m
        tobj = jnp.zeros(pi.shape[:4], pred.dtype)
        tobj = tobj.at[t.b, t.gj, t.gi, t.a].max(iou_det)
        obj_bce = _bce_logits(pi[..., 4], tobj, hyp.obj_pw)
        lobj = lobj + jnp.mean(obj_bce) * BALANCE3[i]

        # Classification (loss.py:153-157)
        if nc > 1:
            tc = jnp.full((t.tcls.shape[0], nc), cn, pred.dtype)
            tc = tc.at[jnp.arange(t.tcls.shape[0]), t.tcls].set(cp)
            cls_bce = _bce_logits(pred[:, 5:5 + nc], tc, hyp.cls_pw)
            lcls = lcls + jnp.sum(cls_bce * m[:, None]) / (n * nc)

        if seg:
            li, di = _layer_mask_loss(pred[:, 5 + nc:], t.mask, targets,
                                      proto, gt_masks, na, B, T, mask_cap)
            lseg = lseg + li
            dropped = dropped + di

    lbox = lbox * hyp.box
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    items = {"box": lbox, "obj": lobj, "cls": lcls}
    if seg:
        items["seg"] = lseg * hyp.box / B      # :104-108 lseg gain
        items["seg_dropped"] = dropped
    total = (lbox + lobj + lcls + items.get("seg", 0.0)) * B
    return total, items


def _layer_mask_loss(coefs, cand_mask, targets, proto, gt_masks, na, B, T,
                     mask_cap):
    """single_mask_loss over one layer's dense candidate set.

    The dense candidates are laid out (5 offsets, na, B*T) flattened;
    per-image selection reshapes to (B, C=5*na*T), picks up to mask_cap
    valid candidates (valid-first stable sort — deterministic), and
    vmaps the prototype matmul + cropped BCE over the batch.
    """
    Hm, Wm = proto.shape[1], proto.shape[2]
    C = 5 * na * T

    def per_img(x):                           # (K=5*na*B*T, ...) -> (B, C, ...)
        x = x.reshape((5, na, B, T) + x.shape[1:])
        return jnp.moveaxis(x, 2, 0).reshape((B, C) + x.shape[4:])

    vm = per_img(cand_mask)                                    # (B, C)
    order = jnp.argsort(~vm, axis=1, stable=True)[:, :mask_cap]  # (B, Km)
    vsel = jnp.take_along_axis(vm, order, axis=1)              # (B, Km)
    csel = jnp.take_along_axis(per_img(coefs), order[..., None], axis=1)
    ti = order % T                                             # target slot
    barng = jnp.arange(B)[:, None]
    xywhn = targets[barng, ti, 1:5]                            # (B, Km, 4)
    gt = gt_masks[barng, ti]                                   # (B, Km, Hm, Wm)

    # pred_mask = coefs @ protos  (:113)
    pm = jnp.einsum("bkm,bhwm->bkhw", csel, proto)
    bce = _bce_logits(pm, gt.astype(pm.dtype), 1.0)

    # crop to the target box in mask pixels (general.py crop_mask :7-22)
    scale = jnp.asarray([Wm, Hm, Wm, Hm], jnp.float32)
    mx = xywhn * scale
    x1, y1 = mx[..., 0] - mx[..., 2] / 2, mx[..., 1] - mx[..., 3] / 2
    x2, y2 = mx[..., 0] + mx[..., 2] / 2, mx[..., 1] + mx[..., 3] / 2
    r = jnp.arange(Wm, dtype=jnp.float32)[None, None, None, :]
    c = jnp.arange(Hm, dtype=jnp.float32)[None, None, :, None]
    inbox = ((r >= x1[..., None, None]) & (r < x2[..., None, None])
             & (c >= y1[..., None, None]) & (c < y2[..., None, None]))
    area = jnp.maximum(xywhn[..., 2] * xywhn[..., 3], 1e-9)    # marea :91
    per_cand = jnp.mean(bce * inbox, axis=(2, 3)) / area       # (B, Km)

    vselF = vsel.astype(per_cand.dtype)
    n_b = jnp.sum(vselF, axis=1)                               # (B,)
    per_image = jnp.sum(per_cand * vselF, axis=1) / jnp.maximum(n_b, 1.0)
    li = jnp.sum(per_image)
    dropped = jnp.sum(jnp.maximum(
        jnp.sum(vm, axis=1) - jnp.asarray(mask_cap), 0)).astype(jnp.int32)
    return li, dropped
