"""Recognition / caption training (MCT apis/train.py equivalent).

One jitted step per model family:
  * classification (Recognizer3D): CE over class scores, SGD-momentum with
    weight decay like the mmaction TimeSformer recipe, or AdamW;
  * label-sequence (Recognizer3DRelseq): SeqMLL loss with teacher forcing.

Epoch runner semantics follow the mmcv EpochBasedRunner + EvalHook: train N
epochs, validate every `eval_interval`, keep `save_best` by the chosen
metric, checkpoint every epoch (configs/_base_/default_runtime.py:1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..metrics.accuracy import mean_class_accuracy, top_k_accuracy


@dataclasses.dataclass(frozen=True)
class RecognitionTrainConfig:
    optimizer: str = "sgd"           # | 'adamw'
    learning_rate: float = 0.005
    momentum: float = 0.9
    weight_decay: float = 1e-4
    grad_clip: float = 40.0          # mmaction grad_clip=dict(max_norm=40)
    num_epochs: int = 15
    eval_interval: int = 1
    warmup_steps: int = 0


class RecTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_rec_optimizer(cfg: RecognitionTrainConfig, total_steps: int = 10000):
    if cfg.warmup_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, total_steps)
    else:
        sched = cfg.learning_rate
    if cfg.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    else:
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(sched, momentum=cfg.momentum))
    if cfg.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def make_cls_train_step(model, tx):
    def loss_fn(params, videos, labels, rng):
        scores = model.apply({"params": params}, videos, train=True,
                             rngs={"dropout": rng})
        loss = optax.softmax_cross_entropy_with_integer_labels(
            scores, labels).mean()
        acc = (scores.argmax(-1) == labels).mean()
        return loss, acc

    def step(state: RecTrainState, videos, labels, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, videos, labels, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (RecTrainState(params, opt_state, state.step + 1),
                {"loss": loss, "top1_acc": acc})

    return jax.jit(step)


def make_seq_train_step(model, tx):
    def loss_fn(params, videos, targets_emb, mask, rng):
        return model.apply({"params": params}, videos, targets_emb, mask,
                           method="forward_train", rngs={"dropout": rng})

    def step(state: RecTrainState, videos, targets_emb, mask, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, videos, targets_emb, mask, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (RecTrainState(params, opt_state, state.step + 1),
                {"loss": loss})

    return jax.jit(step)


def evaluate_classification(model, params, batches) -> dict:
    """batches: iterable of (videos, labels, n_valid). Returns mmaction-style
    metrics (top_k_accuracy, mean_class_accuracy)."""
    fn = jax.jit(lambda p, v: model.apply({"params": p}, v))
    scores, labels = [], []
    for videos, lab, n in batches:
        s = np.asarray(fn(params, videos))[:n]
        scores.extend(list(s))
        labels.extend(list(np.asarray(lab)[:n]))
    top1, top5 = top_k_accuracy(scores, labels, (1, min(5, scores[0].shape[0])))
    return {"top1_acc": top1, "top5_acc": top5,
            "mean_class_accuracy": mean_class_accuracy(scores, labels)}
