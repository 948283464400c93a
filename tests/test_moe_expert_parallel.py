"""Expert-parallel switch MoE on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cross_modal_video_engine_tpu.parallel.moe import expert_parallel_mlp

rng = np.random.default_rng(443)


def _mesh(E):
    return Mesh(np.asarray(jax.devices()[:E]), ("expert",))


def test_moe_routes_to_the_right_expert():
    E, D, N = 4, 4, 16
    mesh = _mesh(E)
    # tokens positive with a dominant feature -> deterministic routing
    x = rng.uniform(0.1, 0.5, (N, D)).astype(np.float32)
    dominant = np.arange(N) % E
    x[np.arange(N), dominant] += 5.0
    router_w = np.eye(D, E, dtype=np.float32) * 10.0
    # expert e scales by (e+1): relu(x @ I) @ (I*(e+1)) = (e+1)*x  (x>0)
    w1 = np.stack([np.eye(D, dtype=np.float32)] * E)
    w2 = np.stack([np.eye(D, dtype=np.float32) * (e + 1)
                   for e in range(E)])

    out, aux = expert_parallel_mlp(
        jnp.asarray(x), jnp.asarray(router_w), jnp.asarray(w1),
        jnp.asarray(w2), mesh, capacity_factor=4.0)
    out = np.asarray(out)
    probs = np.exp(x @ router_w)
    probs = probs / probs.sum(1, keepdims=True)
    gate = probs.max(1)
    want = x * (dominant + 1)[:, None] * gate[:, None]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
    assert float(aux["dropped_fraction"]) == 0.0
    # perfectly balanced routing -> load-balance loss ~= 1
    np.testing.assert_allclose(float(aux["load_balance_loss"]), 1.0,
                               atol=0.05)


def test_moe_capacity_overflow_passes_through():
    E, D, N = 4, 4, 16
    mesh = _mesh(E)
    # every token routes to expert 0 -> most exceed capacity
    x = rng.uniform(0.1, 0.5, (N, D)).astype(np.float32)
    x[:, 0] += 5.0
    router_w = np.eye(D, E, dtype=np.float32) * 10.0
    w1 = np.stack([np.eye(D, dtype=np.float32)] * E)
    w2 = np.stack([np.eye(D, dtype=np.float32) * 7.0] * E)
    out, aux = expert_parallel_mlp(
        jnp.asarray(x), jnp.asarray(router_w), jnp.asarray(w1),
        jnp.asarray(w2), mesh, capacity_factor=1.0)
    out = np.asarray(out)
    assert float(aux["dropped_fraction"]) > 0.0
    # per device (4 local tokens, capacity 1): slot 0 transformed, the
    # rest ZERO (pre-residual output: the consumer's x + out residual
    # passes dropped tokens through as identity)
    transformed = np.isclose(out / np.maximum(x, 1e-9), 7.0 * 0.99,
                             rtol=0.2).all(axis=1)
    dropped_rows = np.isclose(out, 0.0).all(axis=1)
    assert (transformed | dropped_rows).all()
    assert dropped_rows.sum() == 12 and transformed.sum() == 4


def test_moe_differentiates():
    E, D, N, H = 2, 4, 8, 8
    mesh = _mesh(E)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    params = {
        "router": jnp.asarray(rng.standard_normal((D, E)) * 0.1,
                              jnp.float32),
        "w1": jnp.asarray(rng.standard_normal((E, D, H)) * 0.3, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((E, H, D)) * 0.3, jnp.float32),
    }

    @jax.jit
    def loss_fn(p):
        out, aux = expert_parallel_mlp(x, p["router"], p["w1"], p["w2"],
                                       mesh)
        return jnp.mean(out ** 2) + 0.01 * aux["load_balance_loss"]

    g = jax.grad(loss_fn)(params)
    for k in ("router", "w1", "w2"):
        gk = np.asarray(g[k])
        assert np.isfinite(gk).all()
        assert np.abs(gk).max() > 0, k


def test_moe_bf16_slots_past_256_do_not_collide():
    """Regression: slot positions were cumsum'd in the token dtype, so
    bf16 tokens past position 256 (inexact in bf16) collided into the
    same dispatch slot and their features silently summed."""
    E, D, N = 2, 8, 1024
    mesh = _mesh(E)
    x = rng.uniform(0.1, 0.5, (N, D)).astype(np.float32)
    x[:, 0] += 5.0                     # everyone routes to expert 0
    router_w = np.eye(D, E, dtype=np.float32) * 10.0
    w1 = np.stack([np.eye(D, dtype=np.float32)] * E)
    w2 = np.stack([np.eye(D, dtype=np.float32)] * E)
    out, aux = expert_parallel_mlp(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(router_w),
        jnp.asarray(w1), jnp.asarray(w2), mesh, capacity_factor=2.0)
    assert float(aux["dropped_fraction"]) == 0.0
    probs = np.exp(x @ router_w)
    probs = probs / probs.sum(1, keepdims=True)
    want = x * probs.max(1)[:, None]   # identity expert * gate
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               rtol=0.05, atol=0.05)
