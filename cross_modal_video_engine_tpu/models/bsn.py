"""BSN: Boundary-Sensitive Network for temporal proposals.

TPU rebuild of mmaction's BSN pair:
* `TEM` — 1D conv stack emitting per-snippet action/start/end
  probabilities;
* PGM (proposal generation) — host-side boundary pairing + the
  boundary-sensitive proposal FEATURE: action-probability sampled over
  the proposal span and its boundaries (linear interpolation, numpy);
* `PEM` — an MLP scoring proposal features.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class TEM(nn.Module):
    hidden: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict:
        """x: (B, T, F) -> action/start/end probs (B, T)."""
        h = nn.relu(nn.Conv(self.hidden, (3,), padding=1, name="c1")(x))
        h = nn.relu(nn.Conv(self.hidden, (3,), padding=1, name="c2")(h))
        out = jax.nn.sigmoid(nn.Conv(3, (1,), name="c3")(h))
        return {"action": out[..., 0], "start": out[..., 1],
                "end": out[..., 2]}


class PEM(nn.Module):
    """MLP proposal scorer.  The fc output ratios match the reference
    exactly (bsn.py:306-309: relu(0.1*fc1(x)), sigmoid(0.1*fc2(x))) so
    a torch PEM checkpoint's weights map 1:1; fc*_ratio=1.0 recovers
    the plain MLP the early tests trained."""
    hidden: int = 128
    fc1_ratio: float = 0.1
    fc2_ratio: float = 0.1

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """feats: (N, D) proposal features -> (N,) confidence."""
        h = nn.relu(self.fc1_ratio * nn.Dense(self.hidden, name="fc1")(feats))
        return jax.nn.sigmoid(
            self.fc2_ratio * nn.Dense(1, name="fc2")(h))[..., 0]


def match_boundaries(start: np.ndarray, end: np.ndarray,
                     threshold: float = 0.5,
                     max_proposals: int = 200) -> np.ndarray:
    """Pair start/end peaks into candidate (s, e) proposals (PGM step 1):
    a snippet is a boundary if its prob exceeds threshold*max or is a
    local peak."""
    def candidates(p):
        peak = np.zeros_like(p, bool)
        peak[1:-1] = (p[1:-1] > p[:-2]) & (p[1:-1] > p[2:])
        strong = p > threshold * p.max()
        return np.nonzero(peak | strong)[0]

    starts = candidates(start)
    ends = candidates(end)
    rows = [(s, e, float(start[s] * end[e]))
            for s in starts for e in ends if e > s]
    rows.sort(key=lambda r: -r[2])
    return np.asarray(rows[:max_proposals], np.float32)


def proposal_features(action: np.ndarray, proposals: np.ndarray,
                      n_body: int = 16, n_boundary: int = 4) -> np.ndarray:
    """Boundary-sensitive feature: action prob sampled over the span and
    over both boundary regions (linear interp) -> (N, n_body+2*n_boundary).
    """
    T = len(action)

    def sample(lo, hi, n):
        pts = np.linspace(lo, hi, n)
        lo_i = np.clip(np.floor(pts).astype(int), 0, T - 1)
        hi_i = np.clip(lo_i + 1, 0, T - 1)
        frac = pts - np.floor(pts)
        return (1 - frac) * action[lo_i] + frac * action[hi_i]

    out = []
    for s, e, _ in proposals:
        d = max(e - s, 1.0)
        out.append(np.concatenate([
            sample(s, e, n_body),
            sample(s - d / 5, s + d / 5, n_boundary),
            sample(e - d / 5, e + d / 5, n_boundary),
        ]))
    return np.asarray(out, np.float32)
