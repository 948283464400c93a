"""One-pass BatchNorm statistics: E[x] and E[x²] in a single reduction.

The r4 trace attribution (docs/PERF.md, BENCH_PROFILE_r4.json) named the
BN statistic reductions as a top non-conv line of the conv-family train
steps (SlowFast `convert_reduce_fusion` 34 ms = 11% of device time; the
train-vs-frozen BN phase split put the stat tax at 25.5 ms = 23% of the
forward).  `flax.linen.BatchNorm` computes mean and mean-of-squares as
two separate `jnp.mean` calls; whether XLA's multi-output fusion merges
them into one HBM pass is exactly what this module A/Bs: it computes
both sums with ONE variadic `lax.reduce`, so the compiler is *forced*
into a single pass over the activation.

Drop-in for `nn.BatchNorm(use_running_average=..., momentum=...,
epsilon=...)` as the conv families use it (channels-last, no extra
axes): identical param tree ({'scale','bias'} + batch_stats
{'mean','var'}), same biased-variance running update, same promoted
output dtype — pinned by tests/test_one_pass_bn.py against
flax.linen.BatchNorm on both f32 and bf16 inputs.

Measured verdict: see docs/PERF.md "BN A/B" section /
BENCH_PROFILE_r5.json (bench_profile.profile_bn_ab swaps it into the
SlowFast and YOLO steps via the models' `_bn` factories).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class OnePassBatchNorm(nn.Module):
    """BatchNorm whose batch statistics are one variadic reduction."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = float(np.prod([x.shape[a] for a in axes]))
            xf = x.astype(jnp.float32)
            # ONE pass: both sums ride a single variadic lax.reduce
            # (flax issues two jnp.mean reductions and leaves the merge
            # to XLA's multi-output fusion)
            s1, s2 = jax.lax.reduce(
                (xf, xf * xf),
                (jnp.float32(0), jnp.float32(0)),
                lambda acc, v: (acc[0] + v[0], acc[1] + v[1]),
                axes)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                # flax semantics: biased batch variance into the EMA
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        # mirror flax _normalize exactly: math promotes to f32 via the
        # f32 stats, the (C,)-sized rsqrt*scale folds first, and the
        # result casts to result_type(x, scale, bias) (bf16 when the
        # train step casts params to bf16, f32 otherwise)
        y = x - mean
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = y * mul + bias
        return jnp.asarray(y, jnp.result_type(x, scale, bias))
