"""Multi-label sequence loss for caption/label-sequence generation.

Parity with MCT/mmaction/models/losses/seqmll_loss.py:10-78:
`multilabel_categorical_crossentropy` is the logsumexp-margin multilabel CE
(https://kexue.fm/archives/7359 construction); `seq_mll_loss` applies it per
decoder step, masks padded steps, and normalizes by batch size.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import logsumexp


def multilabel_categorical_crossentropy(y_true: jnp.ndarray,
                                        y_pred: jnp.ndarray) -> jnp.ndarray:
    """y_true in {0,1}, y_pred raw logits; returns per-row loss (..., )."""
    y_pred = (1.0 - 2.0 * y_true) * y_pred
    y_pred_neg = y_pred - y_true * 1e12
    y_pred_pos = y_pred - (1.0 - y_true) * 1e12
    zeros = jnp.zeros_like(y_pred[..., :1])
    y_pred_neg = jnp.concatenate([y_pred_neg, zeros], axis=-1)
    y_pred_pos = jnp.concatenate([y_pred_pos, zeros], axis=-1)
    neg_loss = logsumexp(y_pred_neg, axis=-1)
    pos_loss = logsumexp(y_pred_pos, axis=-1)
    return neg_loss + pos_loss


def seq_mll_loss(cls_score: jnp.ndarray, label: jnp.ndarray,
                 mask: jnp.ndarray, loss_weight: float = 1.0) -> jnp.ndarray:
    """cls_score: (N, T, C+1) logits; label: (N, T', C+1); mask: (N, T')."""
    t = cls_score.shape[1]
    label = label[:, :t]
    mask = mask[:, :t]
    batch_size = cls_score.shape[0]
    loss = multilabel_categorical_crossentropy(
        label.reshape(-1, label.shape[-1]),
        cls_score.reshape(-1, cls_score.shape[-1]),
    )
    return loss_weight * jnp.sum(loss * mask.reshape(-1)) / batch_size
