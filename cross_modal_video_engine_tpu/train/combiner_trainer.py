"""Combiner (composed retrieval) training.

Re-implements MultiFusion/src/combiner_train.py:242-438: the CLIP towers
stay frozen (video features precomputed, text encoded by the frozen text
tower), only the Combiner trains with in-batch contrastive CE over the
target features.  bf16 on TPU replaces the reference AMP GradScaler
(combiner_train.py:319,374-376) — no loss scaling needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.combiner import Combiner, CombinerConfig


@dataclasses.dataclass(frozen=True)
class CombinerTrainConfig:
    learning_rate: float = 2e-5
    grad_clip: float = 0.0
    num_epochs: int = 300
    validation_frequency: int = 3     # epochs (combiner_train.py:392)


class CombinerTrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_combiner_optimizer(cfg: CombinerTrainConfig):
    steps = [optax.adam(cfg.learning_rate)]
    if cfg.grad_clip > 0:
        steps.insert(0, optax.clip_by_global_norm(cfg.grad_clip))
    return optax.chain(*steps)


def make_combiner_train_step(model: Combiner, tx):
    def loss_fn(params, ref_feats, text_feats, target_feats, rng):
        logits = model.apply({"params": params}, ref_feats, text_feats,
                             target_feats, train=True,
                             rngs={"dropout": rng})
        labels = jnp.arange(logits.shape[0])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    def train_step(state: CombinerTrainState, ref_feats, text_feats,
                   target_feats, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, ref_feats, text_feats, target_feats, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return CombinerTrainState(params, opt_state), loss

    return jax.jit(train_step)


def init_combiner_state(model: Combiner, tx, ref_feats, text_feats,
                        target_feats, seed: int = 0) -> CombinerTrainState:
    variables = model.init(jax.random.key(seed), ref_feats, text_feats,
                           target_feats)
    return CombinerTrainState(variables["params"],
                              tx.init(variables["params"]))


def composed_rank_eval(model: Combiner, params, ref_feats, text_feats,
                       index_high: jnp.ndarray, reference_rows: jnp.ndarray,
                       gt_rows: jnp.ndarray, top_k: int = 50
                       ) -> Tuple[jnp.ndarray, dict]:
    """Reference-video-masked recall eval (MultiFusion validate.py:76-138):
    the query's own reference video is removed from the ranking before
    computing R@K.  Returns the top-`top_k` ranking columns (default 50,
    covering R@<=50; composed_validate asks for 100 to mirror the
    reference's top-100 dump) — an exact top-k instead of a full argsort
    of the (Q, N) matrix; large galleries use the TPU PartialReduce
    (lax.approx_max_k at recall_target=1.0 = exact, see CLAUDE.md)."""
    pred = model.apply({"params": params}, ref_feats, text_feats,
                       method="combine_features")
    index = index_high.mean(axis=1)
    index = index / jnp.linalg.norm(index, axis=-1, keepdims=True)
    dists = 1.0 - jnp.dot(pred, index.T, preferred_element_type=jnp.float32)
    # mask out the reference video of each query
    q = jnp.arange(dists.shape[0])
    dists = dists.at[q, reference_rows].set(jnp.inf)
    n = dists.shape[1]
    kk = min(top_k, n)
    if n > 4096:
        _, order = jax.lax.approx_max_k(-dists, kk, recall_target=1.0)
    else:
        _, order = jax.lax.top_k(-dists, kk)
    hits = order == gt_rows[:, None]
    h = np.asarray(hits)
    metrics = {}
    for k in (1, 5, 10, 50):
        metrics[f"recall_at{k}"] = float(
            h[:, : min(k, kk)].any(axis=1).mean() * 100)
    return np.asarray(order), metrics
