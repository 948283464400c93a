"""Ring attention parity on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.ops.ring_attention import ring_attention
from cross_modal_video_engine_tpu.parallel.mesh import make_mesh

rng = np.random.default_rng(251)


def _ref(q, k, v, scale):
    s = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_ring_attention_matches_full():
    mesh = make_mesh()       # 8 devices on 'data'
    B, H, S, D = 1, 2, 64, 16   # S sharded 8 x 8
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)
    with mesh:
        out = np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                        jnp.asarray(v), mesh, scale))
    np.testing.assert_allclose(out, _ref(q, k, v, scale), rtol=2e-4,
                               atol=2e-5)


def test_ring_attention_jit_and_grad():
    mesh = make_mesh()
    B, H, S, D = 1, 1, 32, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)

    @jax.jit
    def loss(q):
        with mesh:
            return jnp.sum(ring_attention(q, q, q, mesh) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
