"""Temporal-shuffle contrast losses.

The reference probes temporal sensitivity by training with shuffled-frame
clips next to ordered ones (MCT recognizer_shuffle.py):
* `cosine_away_loss` — torch CosineEmbeddingLoss at target −1: push the
  shuffled clip's embedding away from the ordered clip's
  (ce_cos_loss.py:39,55-64; the released forward comments the term out,
  the 'emb' recognizer is its consumer);
* `soft_label_smooth` + `soft_cross_entropy` — shuffled clips supervised
  with a softened one-hot so the model is LESS confident on them
  (ce_soft_loss.py:56-61,110-140).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cosine_away_loss(x: jnp.ndarray, y: jnp.ndarray,
                     margin: float = 0.5) -> jnp.ndarray:
    """mean(max(0, cos(x_i, y_i) - margin)) — CosineEmbeddingLoss with
    target = -1 for every pair."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    cos = jnp.sum(xn * yn, axis=-1)
    return jnp.mean(jnp.maximum(cos - margin, 0.0))


def soft_label_smooth(labels: jnp.ndarray, num_classes: int,
                      margin: float = 0.5) -> jnp.ndarray:
    """(B,) int labels -> (B, C): true class gets `margin`, the rest
    (1 - margin)/C (ce_soft_loss.py label_softer)."""
    onehot = jax.nn.one_hot(labels, num_classes)
    rest = (1.0 - margin) / num_classes
    return jnp.where(onehot == 0, rest, margin)


def soft_cross_entropy(scores: jnp.ndarray,
                       soft_labels: jnp.ndarray) -> jnp.ndarray:
    lsm = jax.nn.log_softmax(scores, axis=-1)
    return jnp.mean(-(soft_labels * lsm).sum(axis=-1))
