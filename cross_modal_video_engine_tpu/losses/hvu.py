"""HVU multi-category tag loss.

JAX rebuild of MCT/mmaction/models/losses/hvu_loss.py:10-160: BCE over
the concatenated tag vocabulary of the Holistic Video Understanding
categories, either as one flat loss ('all') or per category
('individual') with normalized per-category weights; `with_mask` skips
tags/categories that are unlabeled for a clip (they would otherwise
count as negatives).  Consumes the (label, mask, category_mask) triple
the HVU dataset (data/datasets_extra.py) yields.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import optax

DEFAULT_CATEGORIES = ("action", "attribute", "concept", "event", "object",
                      "scene")
DEFAULT_CATEGORY_NUMS = (739, 117, 291, 69, 1678, 248)


def hvu_loss(cls_score: jnp.ndarray, label: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None,
             category_mask: Optional[jnp.ndarray] = None,
             categories: Sequence[str] = DEFAULT_CATEGORIES,
             category_nums: Sequence[int] = DEFAULT_CATEGORY_NUMS,
             category_loss_weights: Optional[Sequence[float]] = None,
             loss_type: str = "all", with_mask: bool = False,
             reduction: str = "mean") -> Dict[str, jnp.ndarray]:
    """cls_score/label: (B, sum(category_nums)) logits / many-hot tags;
    mask: (B, total) per-tag validity; category_mask: (B, n_categories).
    Returns a dict with 'loss_cls' plus per-category '<name>_LOSS' (and
    '_weight') entries in 'individual' mode."""
    assert loss_type in ("all", "individual")
    assert reduction in ("mean", "sum")
    if category_loss_weights is None:
        category_loss_weights = (1.0,) * len(categories)
    bce = optax.sigmoid_binary_cross_entropy(cls_score, label)

    if loss_type == "all":
        if with_mask:
            assert mask is not None
            w = (mask * bce).sum(axis=1)
            if reduction == "mean":
                w = w / jnp.maximum(mask.sum(axis=1), 1e-6)
            return {"loss_cls": jnp.mean(w)}
        per = bce.sum(axis=-1) if reduction == "sum" else bce
        return {"loss_cls": jnp.mean(per)}

    starts = [0]
    for n in category_nums[:-1]:
        starts.append(starts[-1] + n)
    losses: Dict[str, jnp.ndarray] = {}
    weights: Dict[str, jnp.ndarray] = {}
    for idx, (name, num, start) in enumerate(
            zip(categories, category_nums, starts)):
        cat = bce[:, start:start + num]
        per = cat.mean(axis=1) if reduction == "mean" else cat.sum(axis=1)
        if with_mask:
            assert category_mask is not None
            cm = category_mask[:, idx].reshape(-1)
            n_labeled = cm.sum()
            cat_loss = jnp.where(n_labeled >= 0.5,
                                 (per * cm).sum()
                                 / jnp.maximum(n_labeled, 1e-6),
                                 0.0)
            w = jnp.where(n_labeled >= 0.5,
                          category_loss_weights[idx], 0.0)
        else:
            cat_loss = per.mean()
            w = jnp.asarray(category_loss_weights[idx], jnp.float32)
        losses[f"{name}_LOSS"] = cat_loss
        weights[f"{name}_LOSS"] = w

    total_w = sum(weights.values())
    norm = {k: v / jnp.maximum(total_w, 1e-6) for k, v in weights.items()}
    losses["loss_cls"] = sum(losses[k] * norm[k] for k in norm)
    losses.update({k + "_weight": v for k, v in norm.items()})
    return losses
