"""Teacher->student distillation losses.

Parity with LINAS-engine/model.py:553-580 (criteria) and :834-883 (use):
  * mse_distill: sum- or mean-reduced MSE between student and teacher
    embeddings.
  * kl_distill: torch-KLDivLoss convention, target * (log(target) - input),
    zero where target <= 0 (torch emits nan there; we clamp — the reference
    only exercises this with 'kl' off by default).
  * similarity_distill: SmoothL1 (huber) between the two BxB in-batch
    similarity matrices, with 'diag' / 'adapt' / 'maxdiag' / 'svd' /
    'eig' / plain variants (model.py:845-872).  The spectral variants
    replicate the reference's exact (quirky) algebra: 'svd' rebuilds
    U @ diag(log s) @ V with torch.svd's V (NOT V^T — so it is not a
    log of the matrix; we reproduce the published computation, bugs and
    all), 'eig' rebuilds B @ diag(Re lambda) @ B^-1 from the
    nonsymmetric eigendecomposition.  jnp.linalg.eig is CPU-only, so
    'eig' runs through a host callback with stopped gradients — faithful
    to the reference, where torch.eig(eigenvectors=True) had no autograd
    either (loss.backward() on that path raises in torch 1.9).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


def huber(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise SmoothL1: 0.5 d^2 if |d|<1 else |d|-0.5."""
    d = a - b
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def mse_distill(student: jnp.ndarray, teacher: jnp.ndarray,
                reduction: str = "sum") -> jnp.ndarray:
    sq = (student - teacher) ** 2
    return jnp.sum(sq) if reduction == "sum" else jnp.mean(sq)


def kl_distill(student: jnp.ndarray, teacher: jnp.ndarray,
               reduction: str = "sum") -> jnp.ndarray:
    term = jnp.where(teacher > 0, teacher * (jnp.log(jnp.maximum(teacher, 1e-30)) - student), 0.0)
    return jnp.sum(term) if reduction == "sum" else jnp.mean(term)


def _svd_log_transform(s: jnp.ndarray) -> jnp.ndarray:
    """Reference model.py:849-853: U @ diag(log sigma) @ V, where V is
    torch.svd's V (columns are right singular vectors) — i.e. Vh.T here.
    Differentiable; runs on TPU through XLA's SVD."""
    u, sv, vh = jnp.linalg.svd(s, full_matrices=False)
    return (u * jnp.log(jnp.maximum(sv, 1e-12))[None, :]) @ vh.T


def _eig_real_transform(s: jnp.ndarray) -> jnp.ndarray:
    """Reference model.py:855-859: B @ diag(Re lambda) @ B^-1 from
    torch.eig.  Nonsymmetric eig has no TPU kernel; computed on host via
    pure_callback with stopped gradients (see module docstring)."""

    def host_eig(mat):
        mat = np.asarray(mat, np.float64)
        w, v = np.linalg.eig(mat)
        out = v @ np.diag(w.real) @ np.linalg.inv(v)
        return np.real(out).astype(np.float32)

    s = jax.lax.stop_gradient(s)
    return jax.pure_callback(
        host_eig, jax.ShapeDtypeStruct(s.shape, jnp.float32), s,
        vmap_method="sequential")


def adaptive_similarity_loss(vid_emb: jnp.ndarray, cap_emb: jnp.ndarray,
                             student_vid_emb: jnp.ndarray,
                             student_cap_emb: jnp.ndarray,
                             mask: jnp.ndarray) -> jnp.ndarray:
    """The `train_mask` objective (model.py:835-843, :896-912): huber
    between teacher/student similarity matrices, weighted by
    softmax(mask, axis=0) and re-weighted by 1/|s1| (teacher magnitudes
    detached).  The caller detaches the embeddings so gradient flows only
    into the learned mask (pa1 on the diagonal, pa2 off it)."""
    s1 = jnp.dot(vid_emb, cap_emb.T, preferred_element_type=jnp.float32)
    s2 = jnp.dot(student_vid_emb, student_cap_emb.T,
                 preferred_element_type=jnp.float32)
    b = mask.shape[0]
    weight = jax.nn.softmax(mask, axis=0)
    reweight = 1.0 / (jnp.abs(jax.lax.stop_gradient(s1)) + 1e-6)
    return jnp.sum(reweight * weight * huber(s1, s2)) * b


def similarity_distill(vid_emb: jnp.ndarray, cap_emb: jnp.ndarray,
                       student_vid_emb: jnp.ndarray, student_cap_emb: jnp.ndarray,
                       similarity_type: str | None = None,
                       adapt_weight: jnp.ndarray | None = None,
                       reduction: str = "sum") -> jnp.ndarray:
    s1 = jnp.dot(vid_emb, cap_emb.T, preferred_element_type=jnp.float32)
    s2 = jnp.dot(student_vid_emb, student_cap_emb.T, preferred_element_type=jnp.float32)
    if similarity_type == "svd":
        h = huber(_svd_log_transform(s1), _svd_log_transform(s2))
        return jnp.sum(h) if reduction == "sum" else jnp.mean(h)
    if similarity_type == "eig":
        h = huber(_eig_real_transform(s1), _eig_real_transform(s2))
        return jnp.sum(h) if reduction == "sum" else jnp.mean(h)
    if similarity_type == "diag":
        return jnp.sum(jnp.diagonal(huber(s1, s2)))
    if similarity_type == "maxdiag":
        return -jnp.sum(jnp.diagonal(s2))
    if similarity_type == "adapt":
        assert adapt_weight is not None, "'adapt' needs the learned mask weights"
        b = adapt_weight.shape[0]
        w = jax.nn.softmax(adapt_weight, axis=0) if adapt_weight.ndim else adapt_weight
        return jnp.sum(w * huber(s1, s2)) * b
    h = huber(s1, s2)
    return jnp.sum(h) if reduction == "sum" else jnp.mean(h)
