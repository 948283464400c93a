"""Bidirectional max-margin triplet ranking loss.

Parity with LINAS-engine/loss.py:83-153 (TripletLoss.forward): score matrix
sim(im, s) with diagonal positives, margin hinge against row/column
diagonals, optional hardest-negative reduction, sum/mean cost style, and
t2v / v2t / all directions.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops.similarity import get_sim


@dataclasses.dataclass(frozen=True)
class TripletLossConfig:
    margin: float = 0.2
    measure: str = "cosine"
    max_violation: bool = False
    cost_style: str = "sum"      # 'sum' | 'mean'
    direction: str = "all"       # 'all' | 't2v' | 'v2t'


def triplet_loss(s: jnp.ndarray, im: jnp.ndarray,
                 cfg: TripletLossConfig = TripletLossConfig()) -> jnp.ndarray:
    """s: caption embeddings (B, d); im: video embeddings (B, d)."""
    sim = get_sim(cfg.measure)
    scores = sim(im, s)                      # (B, B): rows=videos, cols=captions
    diagonal = jnp.diag(scores)[:, None]     # (B, 1)
    d1 = jnp.broadcast_to(diagonal, scores.shape)        # per-row (video) positive
    d2 = jnp.broadcast_to(diagonal.T, scores.shape)      # per-col (caption) positive
    eye = jnp.eye(scores.shape[0], dtype=bool)

    total = jnp.zeros((), dtype=scores.dtype)
    if cfg.direction in ("v2t", "all"):
        cost_s = jnp.clip(cfg.margin + scores - d1, min=0.0)
        cost_s = jnp.where(eye, 0.0, cost_s)
        if cfg.max_violation:
            cost_s = jnp.max(cost_s, axis=1)
        total = total + (jnp.sum(cost_s) if cfg.cost_style == "sum"
                         else jnp.mean(cost_s))
    if cfg.direction in ("t2v", "all"):
        cost_im = jnp.clip(cfg.margin + scores - d2, min=0.0)
        cost_im = jnp.where(eye, 0.0, cost_im)
        if cfg.max_violation:
            cost_im = jnp.max(cost_im, axis=0)
        total = total + (jnp.sum(cost_im) if cfg.cost_style == "sum"
                         else jnp.mean(cost_im))
    return total
