"""Flash attention parity tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cross_modal_video_engine_tpu.ops.flash_attention as fa

rng = np.random.default_rng(91)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(fa.pl, "pallas_call", patched)
    yield


def _ref(q, k, v, scale, causal=False):
    s = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * scale
    if causal:
        Sq, Skv = q.shape[2], k.shape[2]
        mask = np.tril(np.ones((Sq, Skv), bool))
        s = np.where(mask, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_flash_matches_reference_multiblock():
    B, H, S, D = 1, 2, 256, 64
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)
    out = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    np.testing.assert_allclose(out, _ref(q, k, v, scale), rtol=2e-4,
                               atol=2e-5)


def test_flash_causal():
    B, H, S, D = 1, 1, 256, 32
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)
    out = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, True))
    np.testing.assert_allclose(out, _ref(q, k, v, scale, causal=True),
                               rtol=2e-4, atol=2e-5)


def test_flash_unaligned_seq_and_dim():
    """Sq=50 (ViT-B/32 tokens), D=48: padding + masking path."""
    B, H, S, D = 2, 2, 50, 48
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)
    out = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    np.testing.assert_allclose(out, _ref(q, k, v, scale), rtol=2e-4,
                               atol=2e-5)


def test_flash_gradients_flow():
    B, H, S, D = 1, 1, 128, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    scale = 1.0 / np.sqrt(D)

    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, scale) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    # compare against pure-XLA attention gradient
    def loss_ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s, -1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_mha_flash_wrapper():
    B, S, Dm, H = 2, 130, 64, 4
    x = jnp.asarray(rng.standard_normal((B, S, Dm)), jnp.float32)
    out = fa.mha_flash(x, x, x, heads=H)
    assert out.shape == (B, S, Dm)
    assert np.isfinite(np.asarray(out)).all()
