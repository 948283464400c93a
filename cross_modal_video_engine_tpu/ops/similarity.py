"""Pairwise similarity measures on TPU.

The eight similarity measures of LINAS-engine/loss.py:7-80 re-expressed as
XLA-friendly batched ops.  All functions take `im: (n_im, d)` and
`s: (n_s, d)` and return an `(n_im, n_s)` similarity matrix (higher =
more similar), matching the reference's orientation (`cosine_sim(im, s)
= im @ s.T`, loss.py:7-10).

Instead of materializing (n_s, n_im, d) broadcast tensors like the
reference, distance-style measures use the |x-y|^2 = |x|^2 + |y|^2 - 2x.y
expansion so the MXU does the heavy lifting; order/jaccard keep a blocked
broadcast form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.registry import SIMILARITIES


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` (reference model.py l2norm)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


@SIMILARITIES.register("cosine")
def cosine_sim(im: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    # callers pass already-L2-normalized embeddings, like the reference
    return jnp.dot(im, s.T, preferred_element_type=jnp.float32)


@SIMILARITIES.register("order")
def order_sim(im: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """-|max(0, s - im)|_2, transposed to (n_im, n_s) (loss.py:13-19)."""
    diff = jnp.maximum(s[:, None, :] - im[None, :, :], 0.0)
    score = -jnp.sqrt(jnp.sum(diff * diff, axis=2))
    return score.T


@SIMILARITIES.register("euclidean")
def euclidean_sim(im: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """-(squared L2 distance) (loss.py:22-28)."""
    sq = (
        jnp.sum(im * im, axis=1)[:, None]
        + jnp.sum(s * s, axis=1)[None, :]
        - 2.0 * jnp.dot(im, s.T, preferred_element_type=jnp.float32)
    )
    return -jnp.maximum(sq, 0.0)


@SIMILARITIES.register("l2")
def l2_sim(im: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return euclidean_sim(im, s)


@SIMILARITIES.register("l2_norm")
def l2_sim_norm(im: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """squared-L2/dim - 1 (note: reference returns a *distance*-flavored
    quantity here, loss.py:57-63; we keep the exact formula)."""
    return (-euclidean_sim(im, s)) / im.shape[1] - 1.0


@SIMILARITIES.register("l1")
def l1_sim(im: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    diff = jnp.abs(s[:, None, :] - im[None, :, :])
    return -jnp.sum(diff, axis=2).T


@SIMILARITIES.register("l1_norm")
def l1_sim_norm(im: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    diff = jnp.abs(s[:, None, :] - im[None, :, :])
    return jnp.sum(diff, axis=2).T / im.shape[1] - 1.0


@SIMILARITIES.register("jaccard")
def jaccard_sim(im: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """sum(min)/sum(max) over non-negative (e.g. tag-prob) vectors
    (loss.py:65-73)."""
    lo = jnp.minimum(im[:, None, :], s[None, :, :]).sum(-1)
    hi = jnp.maximum(im[:, None, :], s[None, :, :]).sum(-1)
    return lo / hi


def get_sim(name: str):
    """Training-side similarity (reference TripletLoss.__init__ mapping,
    loss.py:93-108 — note the reference feeds the distance-flavored
    L1/L2_sim_norm into the same hinge, and we mirror that exactly)."""
    return SIMILARITIES.get(name)


def _errors(cap: jnp.ndarray, vid: jnp.ndarray, measure: str
            ) -> jnp.ndarray:
    """Exact evaluation.cal_error branch semantics (evaluation.py:17-38):
    cosine L2-normalizes internally, euclidean/l1/l2 are POSITIVE
    unsquared cdist values, the *_norm measures are -cdist/dim - 1, and
    jaccard is -similarity.  (These deliberately differ from the
    train-side loss.py formulas — e.g. train 'euclidean' is -squared —
    because the reference's two files differ; each side matches its
    own file.)  'order' has no reference cal_error branch; it is scored
    as -order_sim in the TRAINING orientation (penalty when the caption
    is not entailed by the video)."""
    d = vid.shape[1]
    if measure == "cosine":
        return -jnp.dot(l2norm(cap), l2norm(vid).T,
                        preferred_element_type=jnp.float32)
    if measure in ("euclidean", "l2", "l2_norm"):
        sq = (jnp.sum(cap * cap, axis=1)[:, None]
              + jnp.sum(vid * vid, axis=1)[None, :]
              - 2.0 * jnp.dot(cap, vid.T,
                              preferred_element_type=jnp.float32))
        dist = jnp.sqrt(jnp.maximum(sq, 0.0))
        return -dist / d - 1.0 if measure == "l2_norm" else dist
    if measure in ("l1", "l1_norm"):
        dist = jnp.sum(jnp.abs(cap[:, None, :] - vid[None, :, :]), axis=2)
        return -dist / d - 1.0 if measure == "l1_norm" else dist
    if measure == "jaccard":
        return -jaccard_sim(cap, vid)
    if measure == "order":
        return -order_sim(vid, cap).T
    raise ValueError(f"unknown measure {measure!r}")


@functools.partial(jax.jit, static_argnames=("measure", "block"))
def _error_matrix(vid: jnp.ndarray, cap: jnp.ndarray, measure: str = "cosine",
                  block: int = 0) -> jnp.ndarray:
    if block and cap.shape[0] > block:
        # memory-chunked like evaluation.cal_error_batch (evaluation.py:41-72)
        n = cap.shape[0]
        pad = (-n) % block
        cap_p = jnp.pad(cap, ((0, pad), (0, 0)))
        chunks = cap_p.reshape(-1, block, cap.shape[1])
        out = jax.lax.map(lambda c: _errors(c, vid, measure), chunks)
        return out.reshape(-1, vid.shape[0])[:n]
    return _errors(cap, vid, measure)


def cal_error(videos, captions, measure: str = "cosine", block: int = 0):
    """Error (lower-better) matrix of shape (n_captions, n_videos), matching
    evaluation.cal_error (evaluation.py:17-38)."""
    vid = jnp.asarray(videos, dtype=jnp.float32)
    cap = jnp.asarray(captions, dtype=jnp.float32)
    return _error_matrix(vid, cap, measure=measure, block=block)
