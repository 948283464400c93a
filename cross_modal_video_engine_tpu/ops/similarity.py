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
    return SIMILARITIES.get(name)


@functools.partial(jax.jit, static_argnames=("measure", "block"))
def _error_matrix(vid: jnp.ndarray, cap: jnp.ndarray, measure: str = "cosine",
                  block: int = 0) -> jnp.ndarray:
    sim = get_sim(measure)
    if block and cap.shape[0] > block:
        # memory-chunked like evaluation.cal_error_batch (evaluation.py:41-72)
        n = cap.shape[0]
        pad = (-n) % block
        cap_p = jnp.pad(cap, ((0, pad), (0, 0)))
        chunks = cap_p.reshape(-1, block, cap.shape[1])
        out = jax.lax.map(lambda c: -sim(c, vid), chunks)
        return out.reshape(-1, vid.shape[0])[:n]
    return -sim(cap, vid)


def cal_error(videos, captions, measure: str = "cosine", block: int = 0):
    """Error (lower-better) matrix of shape (n_captions, n_videos), matching
    evaluation.cal_error (evaluation.py:17-38)."""
    vid = jnp.asarray(videos, dtype=jnp.float32)
    cap = jnp.asarray(captions, dtype=jnp.float32)
    return _error_matrix(vid, cap, measure=measure, block=block)
