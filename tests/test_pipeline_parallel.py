"""SPMD pipeline parallelism on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cross_modal_video_engine_tpu.parallel.pipeline import (
    spmd_pipeline, stack_stage_params)

rng = np.random.default_rng(321)


def _mesh(n, axis="stage"):
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def test_pipeline_matches_sequential():
    S, M, mb, d = 4, 6, 2, 8
    mesh = _mesh(S)
    stages = [{"w": rng.standard_normal((d, d)).astype(np.float32) * 0.3,
               "b": rng.standard_normal(d).astype(np.float32) * 0.1}
              for _ in range(S)]
    params = stack_stage_params([jax.tree.map(jnp.asarray, s)
                                 for s in stages])
    x = rng.standard_normal((M, mb, d)).astype(np.float32)

    def stage_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    got = spmd_pipeline(stage_fn, params, jnp.asarray(x), mesh)
    want = x
    for s in stages:
        want = np.tanh(want @ s["w"] + s["b"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_pipeline_fewer_microbatches_than_stages():
    S, M, mb, d = 4, 2, 1, 4
    mesh = _mesh(S)
    stages = [{"w": np.eye(d, dtype=np.float32) * (i + 1)}
              for i in range(S)]
    params = stack_stage_params([jax.tree.map(jnp.asarray, s)
                                 for s in stages])
    x = rng.standard_normal((M, mb, d)).astype(np.float32)
    got = spmd_pipeline(lambda p, h: h @ p["w"], params, jnp.asarray(x),
                        mesh)
    np.testing.assert_allclose(np.asarray(got), x * 24.0, rtol=1e-5)


def test_pipeline_differentiates():
    S, M, mb, d = 2, 4, 2, 4
    mesh = _mesh(S)
    params = stack_stage_params([
        {"w": jnp.asarray(rng.standard_normal((d, d)), jnp.float32) * 0.3}
        for _ in range(S)])
    x = jnp.asarray(rng.standard_normal((M, mb, d)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((M, mb, d)), jnp.float32)

    def stage_fn(p, h):
        return jnp.tanh(h @ p["w"])

    @jax.jit
    def loss_fn(params):
        out = spmd_pipeline(stage_fn, params, x, mesh)
        return jnp.mean((out - tgt) ** 2)

    g = jax.grad(loss_fn)(params)
    gw = np.asarray(g["w"])
    assert gw.shape == (S, d, d)
    assert np.isfinite(gw).all()
    assert np.abs(gw).max() > 0
    # finite-difference check on one weight
    eps = 1e-3
    p_plus = jax.tree.map(lambda v: v, params)
    p_plus["w"] = p_plus["w"].at[0, 0, 0].add(eps)
    p_minus = jax.tree.map(lambda v: v, params)
    p_minus["w"] = p_minus["w"].at[0, 0, 0].add(-eps)
    fd = (float(loss_fn(p_plus)) - float(loss_fn(p_minus))) / (2 * eps)
    np.testing.assert_allclose(gw[0, 0, 0], fd, rtol=2e-2, atol=1e-4)
