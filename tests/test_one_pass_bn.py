"""OnePassBatchNorm is a drop-in for nn.BatchNorm: same param tree, same
outputs, same running-stat updates, same output dtype — on f32 and on the
bf16 train-step configuration (params cast to bf16, stats f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cross_modal_video_engine_tpu.ops.one_pass_bn import OnePassBatchNorm

rng = np.random.default_rng(3)


def _pair(momentum=0.9, eps=1e-5, train=True):
    ref = nn.BatchNorm(use_running_average=not train, momentum=momentum,
                       epsilon=eps)
    new = OnePassBatchNorm(use_running_average=not train,
                           momentum=momentum, epsilon=eps)
    return ref, new


def _vars(c=24):
    return {
        "params": {"scale": jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0,
                                        jnp.float32),
                   "bias": jnp.asarray(rng.standard_normal(c) * 0.1,
                                       jnp.float32)},
        "batch_stats": {"mean": jnp.asarray(rng.standard_normal(c) * 0.2,
                                            jnp.float32),
                        "var": jnp.asarray(rng.random(c) + 0.5,
                                           jnp.float32)},
    }


@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_parity_with_flax(train, dtype):
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 24)), dtype)
    variables = _vars()
    if dtype == jnp.bfloat16:   # the bf16 train step casts params only
        variables = {
            "params": jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                   variables["params"]),
            "batch_stats": variables["batch_stats"]}
    ref, new = _pair(momentum=0.97, eps=1e-3, train=train)
    if train:
        yr, mr = ref.apply(variables, x, mutable=["batch_stats"])
        yn, mn = new.apply(variables, x, mutable=["batch_stats"])
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mn["batch_stats"][k]),
                np.asarray(mr["batch_stats"][k]), rtol=2e-6, atol=2e-7)
    else:
        yr = ref.apply(variables, x)
        yn = new.apply(variables, x)
    assert yn.dtype == yr.dtype
    np.testing.assert_allclose(np.asarray(yn, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=2e-5, atol=2e-5)


def test_init_tree_matches():
    x = jnp.zeros((2, 5, 5, 8), jnp.float32)
    ref, new = _pair()
    vr = ref.init(jax.random.key(0), x)
    vn = new.init(jax.random.key(0), x)
    assert jax.tree.structure(vr) == jax.tree.structure(vn)
    assert all(a.shape == b.shape and a.dtype == b.dtype
               for a, b in zip(jax.tree.leaves(vr), jax.tree.leaves(vn)))


def test_swaps_into_yolo_bn_factory():
    """The models' `_bn` factories accept the swap bench_profile does."""
    from cross_modal_video_engine_tpu.models import yolo

    orig = yolo._bn
    try:
        yolo._bn = lambda train, name="bn": OnePassBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            name=name)
        m = yolo.ConvBnSiLU(out=16, k=3)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
        v = m.init(jax.random.key(0), x)
        y, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert y.shape == (2, 16, 16, 16)
    finally:
        yolo._bn = orig
    # identical param tree to the stock module -> same checkpoints work
    v_ref = yolo.ConvBnSiLU(out=16, k=3).init(jax.random.key(0), x)
    assert jax.tree.structure(v_ref) == jax.tree.structure(v)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gradient_parity_with_flax(dtype):
    """profile_bn_ab differentiates through the variadic lax.reduce
    inside train steps — pin grads (x + scale/bias) to nn.BatchNorm's."""
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 24)), dtype)
    variables = _vars()
    ref, new = _pair(momentum=0.9, eps=1e-5, train=True)

    def loss(mod):
        def f(xx, params):
            v = {"params": params,
                 "batch_stats": variables["batch_stats"]}
            y, _ = mod.apply(v, xx, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))
        return f

    gr = jax.grad(loss(ref), argnums=(0, 1))(x, variables["params"])
    gn = jax.grad(loss(new), argnums=(0, 1))(x, variables["params"])
    # bf16 x-cotangents quantize to bf16: mean-vs-sum/n rounding can
    # flip one ULP (~4e-3 relative) on isolated elements
    tol = 2e-4 if dtype == jnp.float32 else 1e-2
    for a, b in zip(jax.tree.leaves(gn), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=tol, atol=tol)
