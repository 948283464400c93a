"""Temporal-action-localization training (BMN / BSN / SSN).

Completes the localizer family: label generation on host (numpy), one
jitted train step per model, and proposal evaluation via
metrics.proposals (AR@AN / detection mAP).

Label semantics match the reference generators:
* BMN — gt_iou_map (D, T) = max temporal-iou of each (duration, start)
  anchor against the gt segments; gt_start/gt_end = max intersection-over-
  anchor with a 3/T-wide window around each gt boundary
  (MCT/mmaction/models/localizers/bmn.py:139-175, 286-340);
* BSN TEM — action = max IoP of the 1-snippet anchor with the gt
  segments; start/end windows are max(1/T, boundary_ratio*len) wide
  (localizers/bsn.py:163-207);
* SSN — proposals are bucketed positive / incomplete / background by
  (iou, overlap-self) thresholds and sampled to fixed per-video counts so
  the loss sees a static layout (the reference does this in
  ssn_dataset.py's sampler).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.localization import (bmn_loss, bsn_tem_loss, bsn_pem_loss,
                                   bsn_pem_weighted_loss, ssn_loss)
from ..metrics.proposals import pairwise_temporal_iou


# ---------------------------------------------------------------------------
# label generation (host side)
# ---------------------------------------------------------------------------

def _iou_1d(amin, amax, gmin, gmax):
    inter = np.clip(np.minimum(amax[..., None], gmax)
                    - np.maximum(amin[..., None], gmin), 0, None)
    union = (amax - amin)[..., None] + (gmax - gmin) - inter
    return inter / np.maximum(union, 1e-9)


def _iop_1d(amin, amax, gmin, gmax):
    inter = np.clip(np.minimum(amax[..., None], gmax)
                    - np.maximum(amin[..., None], gmin), 0, None)
    return inter / np.maximum((amax - amin)[..., None], 1e-9)


def bm_mask(T: int, D: Optional[int] = None) -> np.ndarray:
    """(D, T) validity mask: duration-d anchors fit for the first T-d
    starts."""
    D = T if D is None else D
    return (np.arange(T)[None, :] < (T - np.arange(D))[:, None]).astype(
        np.float32)


def bmn_labels(gt_segments: np.ndarray, T: int, D: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """gt_segments: (n, 2) normalized [0,1] -> (gt_iou_map (D, T),
    gt_start (T,), gt_end (T,))."""
    D = T if D is None else D
    gap = 1.0 / T
    tmins = np.arange(T) * gap                       # (T,)
    durations = (np.arange(D) + 1) * gap             # (D,)
    amin = np.broadcast_to(tmins[None, :], (D, T))
    amax = amin + durations[:, None]
    gt = np.atleast_2d(np.asarray(gt_segments, np.float64))
    iou = _iou_1d(amin, amax, gt[:, 0], gt[:, 1])    # (D, T, n)
    gt_iou_map = iou.max(-1).astype(np.float32)

    pad = 3.0 * gap
    # boundary anchors are 2-gap wide: _temporal_anchors(-0.5, 1.5)
    # (bmn.py:134-135), i.e. [gap*(i-0.5), gap*(i+1.5)]
    anchors_min = gap * (np.arange(T) - 0.5)
    anchors_max = gap * (np.arange(T) + 1.5)
    start_lo, start_hi = gt[:, 0] - pad / 2, gt[:, 0] + pad / 2
    end_lo, end_hi = gt[:, 1] - pad / 2, gt[:, 1] + pad / 2
    gt_start = _iop_1d(anchors_min, anchors_max, start_lo, start_hi
                       ).max(-1).astype(np.float32)
    gt_end = _iop_1d(anchors_min, anchors_max, end_lo, end_hi
                     ).max(-1).astype(np.float32)
    return gt_iou_map, gt_start, gt_end


def bsn_tem_labels(gt_segments: np.ndarray, T: int,
                   boundary_ratio: float = 0.1
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(action, start, end) per-snippet match scores (T,) each."""
    gap = 1.0 / T
    amin = gap * np.arange(T)
    amax = amin + gap
    gt = np.atleast_2d(np.asarray(gt_segments, np.float64))
    lens = gt[:, 1] - gt[:, 0]
    pad = np.maximum(gap, boundary_ratio * lens)
    action = _iop_1d(amin, amax, gt[:, 0], gt[:, 1]).max(-1)
    start = _iop_1d(amin, amax, gt[:, 0] - pad / 2,
                    gt[:, 0] + pad / 2).max(-1)
    end = _iop_1d(amin, amax, gt[:, 1] - pad / 2,
                  gt[:, 1] + pad / 2).max(-1)
    return (action.astype(np.float32), start.astype(np.float32),
            end.astype(np.float32))


# ---------------------------------------------------------------------------
# SSN proposal sampler
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SSNSamplerConfig:
    positive_per_video: int = 1
    incomplete_per_video: int = 6
    background_per_video: int = 1
    positive_iou: float = 0.7
    background_iou: float = 0.01
    incomplete_iou: float = 0.3
    incomplete_overlap: float = 0.01
    # minimum fraction of the video a background proposal must span
    # (get_negatives background_coverage_threshold; 0.02 in the shipped
    # SSN configs)
    background_coverage: float = 0.01


def sample_ssn_proposals(proposals: np.ndarray, gt_segments: np.ndarray,
                         gt_labels: np.ndarray, cfg: SSNSamplerConfig,
                         rng: np.random.Generator
                         ) -> Dict[str, np.ndarray]:
    """Bucket proposals by (iou, overlap-self) and sample the fixed
    per-video layout [positives..., incompletes..., backgrounds...].

    proposals: (m, 2+) segments; gt_segments: (n, 2); gt_labels: (n,)
    1-based class ids.  Returns dict(proposals (P, 2), labels (P,),
    proposal_type (P,), bbox_targets (P, 2)); buckets are replicated when
    short (the reference sampler resamples too)."""
    iou = pairwise_temporal_iou(proposals[:, :2], gt_segments)     # (n, m)
    best_gt = iou.argmax(0)
    best_iou = iou.max(0)
    _, overlap = pairwise_temporal_iou(proposals[:, :2], gt_segments,
                                       calculate_overlap_self=True)
    best_overlap = overlap.max(0)

    pos = np.nonzero(best_iou >= cfg.positive_iou)[0]
    # get_negatives is if/elif: a proposal that qualifies as incomplete
    # is NEVER also background, and backgrounds must additionally cover
    # enough of the video (ssn_dataset.py:560-594)
    inc_mask = ((best_iou < cfg.incomplete_iou)
                & (best_overlap > cfg.incomplete_overlap))
    coverage = proposals[:, 1] - proposals[:, 0]     # normalized spans
    inc = np.nonzero(inc_mask)[0]
    bg = np.nonzero(~inc_mask & (best_iou < cfg.background_iou)
                    & (coverage > cfg.background_coverage))[0]

    def pick(idx, k):
        if len(idx) == 0:
            idx = np.arange(len(proposals))
        return rng.choice(idx, size=k, replace=len(idx) < k)

    pos_i = pick(pos, cfg.positive_per_video)
    inc_i = pick(inc, cfg.incomplete_per_video)
    bg_i = pick(bg, cfg.background_per_video)
    order = np.concatenate([pos_i, inc_i, bg_i])

    segs = proposals[order, :2].astype(np.float32)
    labels = gt_labels[best_gt[order]].astype(np.int32)
    labels[len(pos_i) + len(inc_i):] = 0            # background class 0
    ptype = np.concatenate([
        np.zeros(len(pos_i)), np.ones(len(inc_i)),
        np.full(len(bg_i), 2)]).astype(np.int32)

    # regression targets (center offset / log-span) for positives vs their
    # best gt (SSN's location regression parameterization)
    g = gt_segments[best_gt[order]]
    p_ctr, p_len = segs.mean(1), np.maximum(segs[:, 1] - segs[:, 0], 1e-6)
    g_ctr, g_len = g.mean(1), np.maximum(g[:, 1] - g[:, 0], 1e-6)
    targets = np.stack([(g_ctr - p_ctr) / p_len,
                        np.log(g_len / p_len)], 1).astype(np.float32)
    return {"proposals": segs, "labels": labels, "proposal_type": ptype,
            "bbox_targets": targets}


# ---------------------------------------------------------------------------
# train steps
# ---------------------------------------------------------------------------

def make_bmn_train_step(model, tx):
    """jitted (params, opt_state, feats, gt_iou_map, gt_start, gt_end,
    mask, key) -> (params, opt_state, metrics dict)."""

    def loss_fn(params, feats, gt_iou_map, gt_start, gt_end, mask, key):
        out = model.apply({"params": params}, feats)
        total, tem, reg, cls = bmn_loss(
            out["pem_reg"], out["pem_cls"], out["tem_start"],
            out["tem_end"], gt_iou_map, gt_start, gt_end, mask, key)
        return total, {"loss": total, "tem": tem, "pem_reg": reg,
                       "pem_cls": cls}

    @jax.jit
    def step(params, opt_state, feats, gt_iou_map, gt_start, gt_end, mask,
             key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, feats, gt_iou_map, gt_start, gt_end, mask, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return step


def make_bsn_tem_train_step(tem, tx, action_loss_weight: float = 2.0):
    def loss_fn(params, feats, gt_action, gt_start, gt_end):
        out = tem.apply({"params": params}, feats)
        d = bsn_tem_loss(out["action"], out["start"], out["end"],
                         gt_action, gt_start, gt_end, action_loss_weight)
        return d["loss"], d

    @jax.jit
    def step(params, opt_state, feats, gt_action, gt_start, gt_end):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, feats, gt_action, gt_start, gt_end)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return step


def make_bsn_pem_train_step(pem, tx, *, weighted: bool = False,
                            u_ratio_m: float = 1.0, u_ratio_l: float = 2.0,
                            high_thr: float = 0.6, low_thr: float = 0.2):
    """weighted=True uses the reference's u-mask balanced loss
    (bsn.py:313-349) and the step takes a trailing PRNG key."""
    def loss_fn(params, feats, gt_iou, key=None):
        pred = pem.apply({"params": params}, feats)
        if weighted:
            loss = bsn_pem_weighted_loss(pred, gt_iou, key, u_ratio_m,
                                         u_ratio_l, high_thr, low_thr)
        else:
            loss = bsn_pem_loss(pred, gt_iou)
        return loss, {"loss": loss}

    @jax.jit
    def step(params, opt_state, feats, gt_iou, *key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, feats, gt_iou, *key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return step


def make_ssn_train_step(head, tx, sampler_cfg: SSNSamplerConfig,
                        comp_loss_weight: float = 0.1,
                        reg_loss_weight: float = 0.1):
    """jitted (params, opt_state, features (T,F), stpp (P,S,T), labels,
    proposal_type, bbox_targets) -> (params, opt_state, loss dict)."""
    sc = sampler_cfg

    def loss_fn(params, features, stpp, labels, ptype, targets):
        out = head.apply({"params": params}, features, stpp)
        losses = ssn_loss(out["activity"], out["completeness"],
                          out["regression"], ptype, labels, targets,
                          sc.positive_per_video, sc.background_per_video,
                          sc.incomplete_per_video, comp_loss_weight,
                          reg_loss_weight)
        return losses["loss"], losses

    @jax.jit
    def step(params, opt_state, features, stpp, labels, ptype, targets):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, features, stpp, labels, ptype, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return step


def make_ssn_batch_train_step(head, tx, sampler_cfg: SSNSamplerConfig,
                              comp_loss_weight: float = 0.1,
                              reg_loss_weight: float = 0.1):
    """Batched SSN step: features (B, T, F), stpp (B, P, S, T), labels /
    proposal_type (B, P), bbox_targets (B, P, 2).  The head is vmapped
    over the video axis and the flattened (B*P) rows keep the per-video
    [positives..., incompletes..., backgrounds...] grouping ssn_loss's
    static indexers require."""
    sc = sampler_cfg

    def loss_fn(params, features, stpp, labels, ptype, targets):
        out = jax.vmap(
            lambda f, s: head.apply({"params": params}, f, s))(features,
                                                               stpp)
        b, p = labels.shape
        act = out["activity"].reshape(b * p, -1)
        comp = out["completeness"].reshape(b * p, -1)
        reg = out["regression"].reshape(b * p, comp.shape[-1], 2)
        losses = ssn_loss(act, comp, reg, ptype.reshape(-1),
                          labels.reshape(-1), targets.reshape(b * p, 2),
                          sc.positive_per_video, sc.background_per_video,
                          sc.incomplete_per_video, comp_loss_weight,
                          reg_loss_weight)
        return losses["loss"], losses

    @jax.jit
    def step(params, opt_state, features, stpp, labels, ptype, targets):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, features, stpp, labels, ptype, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return step
