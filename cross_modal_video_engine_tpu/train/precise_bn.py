"""Precise BatchNorm: recompute running statistics after training.

Rebuild of MCT/mmaction/utils/precise_bn.py: run N batches through the
model in train-mode BN (batch statistics) and replace the running
mean/var with the aggregated true statistics.  With flax the running
stats live in `batch_stats`, so this is a pure fold over mutated
collections — no module surgery.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp


def update_bn_stats(apply_fn: Callable, variables: Any,
                    batches: Iterable, num_iters: int = 200,
                    momentum: float = 0.9) -> Any:
    """apply_fn(variables, batch, mutable=['batch_stats']) must return
    (out, mutated).  Returns variables with batch_stats replaced by the
    average of the per-batch statistics (momentum-free true average).

    momentum must match the model's BatchNorm momentum (flax default
    0.9; models/yolo.py uses 0.97) — the EMA inversion below is wrong
    otherwise and silently corrupts the recalibrated stats."""
    sums = None
    count = 0
    for i, batch in enumerate(batches):
        if i >= num_iters:
            break
        _, mutated = apply_fn(variables, batch)
        stats = mutated["batch_stats"]
        if sums is None:
            sums = jax.tree.map(lambda x: jnp.zeros_like(x), stats)
        # momentum-corrected: recover the batch statistic from the EMA step
        # new_ema = m*old + (1-m)*batch  =>  batch = (new - m*old)/(1-m)
        old = variables["batch_stats"]
        m = momentum
        batch_stats = jax.tree.map(lambda new, o: (new - m * o) / (1 - m),
                                   stats, old)
        sums = jax.tree.map(lambda s, b: s + b, sums, batch_stats)
        count += 1
    if count == 0:
        return variables
    mean_stats = jax.tree.map(lambda s: s / count, sums)
    out = dict(variables)
    out["batch_stats"] = mean_stats
    return out
