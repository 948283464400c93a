"""SSN: Structured Segment Network (temporal action detection).

TPU rebuild of mmaction's SSN: proposals are augmented with course
context (start/course/end stages), pooled with a Structured Temporal
Pyramid (STPP), and scored by two classifiers — activity (which action)
and completeness (is the proposal whole) — plus location regression.

STPP pooling over precomputed snippet features is expressed as one
sampling matmul per stage part (like the BMN BM layer), so scoring a
batch of proposals is a handful of GEMMs.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def stpp_matrix(T: int, proposals: np.ndarray,
                parts: Tuple[int, ...] = (1, 2, 1),
                extension: float = 0.5) -> np.ndarray:
    """(P, sum(parts)+2, T) averaging weights per proposal: the course
    span split into pyramid `parts` + one start and one end context span
    (extension * duration on each side)."""
    rows = []
    for s, e in proposals[:, :2]:
        d = max(e - s, 1.0)
        spans = [(s - extension * d, s), (e, e + extension * d)]
        segs = []
        # pyramid over the course span
        for p in parts:
            for i in range(p):
                lo = s + d * i / p
                hi = s + d * (i + 1) / p
                segs.append((lo, hi))
        segs = segs + spans
        W = np.zeros((len(segs), T), np.float32)
        for r, (lo, hi) in enumerate(segs):
            lo_i = int(np.clip(np.floor(lo), 0, T - 1))
            hi_i = int(np.clip(np.ceil(hi), lo_i + 1, T))
            W[r, lo_i:hi_i] = 1.0 / (hi_i - lo_i)
        rows.append(W)
    return np.stack(rows)


@dataclasses.dataclass(frozen=True)
class SSNConfig:
    feat_dim: int = 400
    num_classes: int = 20
    parts: Tuple[int, ...] = (1, 2, 1)
    hidden: int = 256


class SSNHead(nn.Module):
    cfg: SSNConfig

    @nn.compact
    def __call__(self, features: jnp.ndarray, stpp: jnp.ndarray) -> dict:
        """features: (T, F) snippet features; stpp: (P, S, T) pooling
        weights.  Returns activity (P, C+1), completeness (P, C),
        regression (P, C, 2)."""
        cfg = self.cfg
        pooled = jnp.einsum("pst,tf->psf", stpp, features,
                            preferred_element_type=jnp.float32)
        S = pooled.shape[1]
        # activity sees the course span only (pyramid part 0 == whole span)
        act_feat = pooled[:, 0]
        # completeness sees the full structured feature
        comp_feat = pooled.reshape(pooled.shape[0], -1)
        act = nn.Dense(cfg.num_classes + 1, name="activity_fc")(
            nn.relu(nn.Dense(cfg.hidden, name="act_hidden")(act_feat)))
        comp = nn.Dense(cfg.num_classes, name="completeness_fc")(
            nn.relu(nn.Dense(cfg.hidden, name="comp_hidden")(comp_feat)))
        reg = nn.Dense(cfg.num_classes * 2, name="regression_fc")(
            nn.relu(nn.Dense(cfg.hidden, name="reg_hidden")(comp_feat)))
        return {"activity": act, "completeness": comp,
                "regression": reg.reshape(-1, cfg.num_classes, 2)}


def ssn_proposal_scores(activity: np.ndarray, completeness: np.ndarray
                        ) -> np.ndarray:
    """(P, C) combined detection scores: softmax activity (minus bg) *
    exp(completeness) — the reference's score fusion."""
    act = np.exp(activity - activity.max(-1, keepdims=True))
    act = act / act.sum(-1, keepdims=True)
    return act[:, 1:] * np.exp(completeness)
