"""Temporal-action-localization losses (BMN / BSN / SSN).

JAX rebuilds of the reference loss family:
* binary logistic regression — MCT/mmaction/models/losses/
  binary_logistic_regression_loss.py:10-30 (positive-ratio reweighted BCE);
* BMN TEM / PEM-reg / PEM-cls — losses/bmn_loss.py:27-137 (the PEM-reg
  random hard-negative subsampling takes an explicit PRNG key instead of
  torch's global rand state);
* BSN TEM (weighted action/start/end BLR, localizers/bsn.py:128-136) and
  PEM (smooth-L1 on temporal iou, localizers/bsn.py:344);
* OHEM hinge + SSN activity/completeness/regression —
  losses/ohem_hinge_loss.py, losses/ssn_loss.py:13-185.  The OHEM top-k
  selection is differentiable by construction in JAX (gradients flow only
  through the kept entries — exactly the reference's hand-written
  backward).

Everything here is shape-static and jit-compatible; the SSN indexers are
fixed-size index arrays prepared by the proposal sampler.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def binary_logistic_regression_loss(pred, label, threshold: float = 0.5,
                                    ratio_range: Tuple[float, float] = (1.05,
                                                                        21),
                                    eps: float = 1e-5):
    """Positive-ratio reweighted binary cross entropy over sigmoid scores."""
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    pmask = (label > threshold).astype(jnp.float32)
    num_positive = jnp.maximum(jnp.sum(pmask), 1.0)
    num_entries = pred.shape[0]
    ratio = jnp.clip(num_entries / num_positive, ratio_range[0],
                     ratio_range[1])
    coef_0 = 0.5 * ratio / (ratio - 1)
    coef_1 = 0.5 * ratio
    loss = (coef_1 * pmask * jnp.log(pred + eps)
            + coef_0 * (1.0 - pmask) * jnp.log(1.0 - pred + eps))
    return -jnp.mean(loss)


# ---------------------------------------------------------------------------
# BMN
# ---------------------------------------------------------------------------

def bmn_tem_loss(pred_start, pred_end, gt_start, gt_end):
    return (binary_logistic_regression_loss(pred_start, gt_start)
            + binary_logistic_regression_loss(pred_end, gt_end))


def bmn_pem_reg_loss(pred_score, gt_iou_map, mask, key,
                     high_threshold: float = 0.7,
                     low_threshold: float = 0.3):
    """MSE over high-iou anchors plus randomly subsampled mid/low anchors
    (subsample rate balances each band against the positives)."""
    u_hmask = (gt_iou_map > high_threshold).astype(jnp.float32)
    u_mmask = ((gt_iou_map <= high_threshold)
               & (gt_iou_map > low_threshold)).astype(jnp.float32)
    u_lmask = ((gt_iou_map <= low_threshold)
               & (gt_iou_map > 0.)).astype(jnp.float32) * mask

    num_h = jnp.sum(u_hmask)
    k_m, k_l = jax.random.split(key)
    r_m = num_h / jnp.maximum(jnp.sum(u_mmask), 1e-6)
    u_smmask = u_mmask * jax.random.uniform(k_m, gt_iou_map.shape)
    u_smmask = (u_smmask > (1.0 - r_m)).astype(jnp.float32)
    r_l = num_h / jnp.maximum(jnp.sum(u_lmask), 1e-6)
    u_slmask = u_lmask * jax.random.uniform(k_l, gt_iou_map.shape)
    u_slmask = (u_slmask > (1.0 - r_l)).astype(jnp.float32)

    weights = u_hmask + u_smmask + u_slmask
    mse = jnp.mean((pred_score * weights - gt_iou_map * weights) ** 2)
    return 0.5 * mse * weights.size / jnp.maximum(jnp.sum(weights), 1e-6)


def bmn_pem_cls_loss(pred_score, gt_iou_map, mask,
                     threshold: float = 0.9,
                     ratio_range: Tuple[float, float] = (1.05, 21),
                     eps: float = 1e-5):
    pmask = (gt_iou_map > threshold).astype(jnp.float32)
    nmask = (gt_iou_map <= threshold).astype(jnp.float32) * mask
    num_positive = jnp.maximum(jnp.sum(pmask), 1.0)
    num_entries = num_positive + jnp.sum(nmask)
    ratio = jnp.clip(num_entries / num_positive, ratio_range[0],
                     ratio_range[1])
    loss_pos = 0.5 * ratio * jnp.log(pred_score + eps) * pmask
    loss_neg = (0.5 * ratio / (ratio - 1)
                * jnp.log(1.0 - pred_score + eps) * nmask)
    return -jnp.sum(loss_pos + loss_neg) / num_entries


def bmn_loss(pred_reg, pred_cls, pred_start, pred_end, gt_iou_map, gt_start,
             gt_end, bm_mask, key, weight_tem: float = 1.0,
             weight_pem_reg: float = 10.0, weight_pem_cls: float = 1.0):
    """Weighted BMN loss -> (total, tem, pem_reg, pem_cls)."""
    gt_iou_map = gt_iou_map * bm_mask
    reg = bmn_pem_reg_loss(pred_reg, gt_iou_map, bm_mask, key)
    cls = bmn_pem_cls_loss(pred_cls, gt_iou_map, bm_mask)
    tem = bmn_tem_loss(pred_start, pred_end, gt_start, gt_end)
    total = weight_tem * tem + weight_pem_reg * reg + weight_pem_cls * cls
    return total, tem, reg, cls


# ---------------------------------------------------------------------------
# BSN
# ---------------------------------------------------------------------------

def bsn_tem_loss(pred_action, pred_start, pred_end, gt_action, gt_start,
                 gt_end, action_loss_weight: float = 2.0) -> Dict:
    """Per-snippet BLR over action/start/end probability sequences."""
    loss_action = binary_logistic_regression_loss(pred_action, gt_action)
    loss_start = binary_logistic_regression_loss(pred_start, gt_start)
    loss_end = binary_logistic_regression_loss(pred_end, gt_end)
    return {
        "loss_action": loss_action * action_loss_weight,
        "loss_start": loss_start,
        "loss_end": loss_end,
        "loss": (loss_action * action_loss_weight + loss_start + loss_end),
    }


def bsn_pem_loss(pred_iou, gt_iou):
    """Smooth-L1 between predicted proposal confidence and temporal iou."""
    return jnp.mean(optax.huber_loss(pred_iou, gt_iou, delta=1.0))


def bsn_pem_weighted_loss(pred_iou, gt_iou, key, u_ratio_m: float = 1.0,
                          u_ratio_l: float = 2.0, high_thr: float = 0.6,
                          low_thr: float = 0.2):
    """The reference PEM training loss (bsn.py:313-349): elementwise
    smooth-L1 kept for ALL high-iou rows plus randomly subsampled
    medium/low rows, balanced to `u_ratio_m`/`u_ratio_l` times the
    high count; the weighted sum is normalized by the kept count."""
    h = (gt_iou > high_thr).astype(jnp.float32)
    m = ((gt_iou <= high_thr) & (gt_iou > low_thr)).astype(jnp.float32)
    low = (gt_iou <= low_thr).astype(jnp.float32)
    num_h = jnp.sum(h)
    km, kl = jax.random.split(key)
    # rand*mask > 1-r keeps each masked row with probability min(r, 1)
    r_m = jnp.minimum(u_ratio_m * num_h / jnp.maximum(jnp.sum(m), 1e-6),
                      1.0)
    sm = (jax.random.uniform(km, gt_iou.shape) * m
          > (1.0 - r_m)).astype(jnp.float32)
    r_l = jnp.minimum(u_ratio_l * num_h / jnp.maximum(jnp.sum(low), 1e-6),
                      1.0)
    sl = (jax.random.uniform(kl, gt_iou.shape) * low
          > (1.0 - r_l)).astype(jnp.float32)
    w = h + sm + sl
    per_row = optax.huber_loss(pred_iou, gt_iou, delta=1.0)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


# ---------------------------------------------------------------------------
# SSN (OHEM hinge completeness + activity CE + classwise regression)
# ---------------------------------------------------------------------------

def ohem_hinge_loss(pred, labels, is_positive: int, ohem_ratio: float,
                    group_size: int):
    """Class-wise hinge with online hard example mining.

    pred: (N, C); labels: (N,) 1-based class ids; is_positive: +1 for
    positive proposals, -1 for incomplete; per group of `group_size` rows
    only the `int(group_size * ohem_ratio)` largest losses contribute.
    Returns the SUM over kept entries (like the reference).
    """
    n = pred.shape[0]
    picked = pred[jnp.arange(n), labels - 1]
    losses = jnp.maximum(1.0 - is_positive * picked, 0.0)
    # no floor: the reference's int(group_size * ohem_ratio) can be 0
    # (the group then contributes nothing), and the kept count must
    # match ssn_completeness_loss's int(N * ohem_ratio) denominator
    keep = int(group_size * ohem_ratio)
    if keep == 0:
        return jnp.zeros((), losses.dtype)
    grouped = losses.reshape(-1, group_size)
    top, _ = jax.lax.top_k(grouped, keep)
    return jnp.sum(top)


def ssn_activity_loss(activity_score, labels, activity_indexer):
    """CE over positive+background proposals (ssn_loss.py:14-29)."""
    pred = activity_score[activity_indexer]
    gt = labels[activity_indexer]
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(pred, gt))


def ssn_completeness_loss(completeness_score, labels, completeness_indexer,
                          positive_per_video: int,
                          incomplete_per_video: int,
                          ohem_ratio: float = 0.17):
    """OHEM hinge over positive (+1) and incomplete (-1) proposals,
    normalized by kept-count (ssn_loss.py:31-81)."""
    pred = completeness_score[completeness_indexer]
    gt = labels[completeness_indexer]
    dim = pred.shape[1]
    per_video = positive_per_video + incomplete_per_video
    pred = pred.reshape(-1, per_video, dim)
    gt = gt.reshape(-1, per_video)
    pos_pred = pred[:, :positive_per_video].reshape(-1, dim)
    inc_pred = pred[:, positive_per_video:].reshape(-1, dim)
    pos_loss = ohem_hinge_loss(pos_pred, gt[:, :positive_per_video].reshape(-1),
                               1, 1.0, positive_per_video)
    inc_loss = ohem_hinge_loss(inc_pred, gt[:, positive_per_video:].reshape(-1),
                               -1, ohem_ratio, incomplete_per_video)
    num_pos = pos_pred.shape[0]
    num_inc = int(inc_pred.shape[0] * ohem_ratio)
    return (pos_loss + inc_loss) / float(num_pos + num_inc)


def ssn_classwise_regression_loss(bbox_pred, labels, bbox_targets,
                                  regression_indexer):
    """Smooth-L1 x2 on the (center, span) offsets of each proposal's own
    class (ssn_loss.py:84-115)."""
    pred = bbox_pred[regression_indexer]           # (P, C, 2)
    gt = labels[regression_indexer]
    target = bbox_targets[regression_indexer]      # (P, 2)
    cls_pred = pred[jnp.arange(pred.shape[0]), gt - 1]   # (P, 2)
    return 2.0 * jnp.mean(optax.huber_loss(cls_pred.reshape(-1),
                                           target.reshape(-1), delta=1.0))


def ssn_loss(activity_score, completeness_score, bbox_pred, proposal_type,
             labels, bbox_targets, positive_per_video: int,
             background_per_video: int, incomplete_per_video: int,
             comp_loss_weight: float = 0.1,
             reg_loss_weight: float = 0.1) -> Dict:
    """Full SSN loss dict (ssn_loss.py:117-185).  proposal_type: (N,) int
    codes 0=positive, 1=incomplete, 2=background; proposals MUST be laid
    out grouped per video as [positives..., incompletes..., backgrounds...]
    (the sampler's contract), so the boolean indexers are static slices."""
    proposal_type = proposal_type.reshape(-1)
    labels = labels.reshape(-1)
    activity_indexer = jnp.nonzero(
        (proposal_type == 0) | (proposal_type == 2),
        size=proposal_type.shape[0], fill_value=0)[0]
    completeness_indexer = jnp.nonzero(
        (proposal_type == 0) | (proposal_type == 1),
        size=proposal_type.shape[0], fill_value=0)[0]
    # fixed sampler layout -> fixed counts; trim the padded nonzero output
    n_videos = proposal_type.shape[0] // (
        positive_per_video + background_per_video + incomplete_per_video)
    act_count = n_videos * (positive_per_video + background_per_video)
    comp_count = n_videos * (positive_per_video + incomplete_per_video)
    activity_indexer = activity_indexer[:act_count]
    completeness_indexer = completeness_indexer[:comp_count]

    losses = {
        "loss_activity": ssn_activity_loss(activity_score, labels,
                                           activity_indexer),
        "loss_completeness": comp_loss_weight * ssn_completeness_loss(
            completeness_score, labels, completeness_indexer,
            positive_per_video, incomplete_per_video,
            ohem_ratio=positive_per_video / incomplete_per_video),
    }
    if bbox_pred is not None:
        regression_indexer = jnp.nonzero(
            proposal_type == 0, size=proposal_type.shape[0],
            fill_value=0)[0][: n_videos * positive_per_video]
        losses["loss_reg"] = reg_loss_weight * ssn_classwise_regression_loss(
            bbox_pred, labels, bbox_targets, regression_indexer)
    losses["loss"] = sum(v for k, v in losses.items() if k != "loss")
    return losses
