"""BMN: Boundary-Matching Network for temporal action proposals.

TPU rebuild of MCT/mmaction/models/localizers/bmn.py: a temporal base
conv stack over snippet features, a Temporal Evaluation Module (start/end
probability sequences) and a Proposal Evaluation Module whose
boundary-matching layer is ONE precomputed sampling matmul —
(C, T) x (T, N*D*T) -> (C, N, D, T) — exactly the MXU-friendly
formulation of the paper's BM layer.

Proposal post-processing (score fusion + soft-NMS) runs host-side like
the reference's numpy path.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BMNConfig:
    temporal_dim: int = 100          # T snippets
    feat_dim: int = 400
    num_samples: int = 32            # N samples per proposal
    max_duration: int = 100          # D
    hidden_1d: int = 256
    hidden_2d: int = 128
    hidden_3d: int = 512


def bm_sampling_matrix(T: int, N: int, D: int) -> np.ndarray:
    """(T, N*D*T) interpolation weights: proposal (start t, duration d)
    samples N points linearly over [t, t+d] with bilinear weights."""
    W = np.zeros((T, N, D, T), np.float32)
    for d in range(D):
        for t in range(T):
            end = t + d + 1
            pts = np.linspace(t, end, N)
            for n, p in enumerate(pts):
                lo = int(np.floor(p))
                frac = p - lo
                if 0 <= lo < T:
                    W[lo, n, d, t] += 1 - frac
                if 0 <= lo + 1 < T:
                    W[lo + 1, n, d, t] += frac
    return W.reshape(T, N * D * T)


class BMN(nn.Module):
    cfg: BMNConfig

    @nn.compact
    def __call__(self, features: jnp.ndarray, *, train: bool = False):
        """features: (B, T, F) snippet features.
        Returns dict(tem_start (B,T), tem_end (B,T),
                     pem_reg (B,D,T), pem_cls (B,D,T))."""
        cfg = self.cfg
        T, N, D = cfg.temporal_dim, cfg.num_samples, cfg.max_duration

        def conv1d(x, ch, name, groups=1):
            return nn.Conv(ch, (3,), padding=1, feature_group_count=groups,
                           name=name)(x)

        base = nn.relu(conv1d(features, cfg.hidden_1d, "base1", 4))
        base = nn.relu(conv1d(base, cfg.hidden_1d, "base2", 4))

        # TEM: start/end probabilities
        tem = nn.relu(conv1d(base, cfg.hidden_1d, "tem1", 4))
        start = jax.nn.sigmoid(nn.Conv(1, (1,), name="tem_start")(tem))[..., 0]
        end = jax.nn.sigmoid(nn.Conv(1, (1,), name="tem_end")(tem))[..., 0]

        # PEM: boundary-matching sampling as one matmul
        pem_in = nn.relu(conv1d(base, cfg.hidden_2d, "pem_conv"))
        W = jnp.asarray(bm_sampling_matrix(T, N, D))    # (T, N*D*T)
        # (B, C, T) @ (T, NDT) -> (B, C, N, D, T)
        bm = jnp.einsum("btc,tm->bcm", pem_in, W,
                        preferred_element_type=jnp.float32)
        bm = bm.reshape(-1, cfg.hidden_2d, N, D, T)
        # collapse the sample axis with 3D convs (reference conv3d stack)
        x = bm.transpose(0, 2, 3, 4, 1)                 # (B, N, D, T, C)
        x = nn.relu(nn.Conv(cfg.hidden_3d, (N, 1, 1),
                            strides=(N, 1, 1), padding="VALID",
                            name="pem_3d")(x))[:, 0]    # (B, D, T, C)
        x = nn.relu(nn.Conv(cfg.hidden_2d, (1, 1), name="pem_2d1")(x))
        x = nn.relu(nn.Conv(cfg.hidden_2d, (3, 3), padding=1,
                            name="pem_2d2")(x))
        out = jax.nn.sigmoid(nn.Conv(2, (1, 1), name="pem_out")(x))
        return {
            "tem_start": start, "tem_end": end,
            "pem_reg": out[..., 0], "pem_cls": out[..., 1],
        }


def generate_proposals(tem_start: np.ndarray, tem_end: np.ndarray,
                       pem_reg: np.ndarray, pem_cls: np.ndarray,
                       max_proposals: int = 100) -> np.ndarray:
    """Host-side proposal scoring: rows (start, end, score) sorted by
    score = s_prob * e_prob * reg * cls (reference score fusion)."""
    T = tem_start.shape[0]
    rows = []
    for d in range(pem_reg.shape[0]):
        for t in range(T):
            end = t + d + 1
            if end >= T:
                continue
            score = (tem_start[t] * tem_end[end]
                     * pem_reg[d, t] * pem_cls[d, t])
            rows.append((t, end, float(score)))
    rows.sort(key=lambda r: -r[2])
    return np.asarray(rows[:max_proposals], np.float32)


def soft_nms(proposals: np.ndarray, sigma: float = 0.4,
             top_k: int = 100) -> np.ndarray:
    """Gaussian soft-NMS over (start, end, score) rows (reference
    post-processing)."""
    props = proposals.copy()
    keep = []
    while len(props) and len(keep) < top_k:
        i = int(np.argmax(props[:, 2]))
        best = props[i]
        keep.append(best.copy())
        props = np.delete(props, i, axis=0)
        if not len(props):
            break
        inter = (np.minimum(best[1], props[:, 1])
                 - np.maximum(best[0], props[:, 0])).clip(0)
        union = (best[1] - best[0]) + (props[:, 1] - props[:, 0]) - inter
        iou = inter / np.maximum(union, 1e-9)
        props[:, 2] *= np.exp(-(iou ** 2) / sigma)
    return np.asarray(keep, np.float32)
