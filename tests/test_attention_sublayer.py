"""Fused attention sublayer (ops/attention_sublayer.py) vs the plain
JAX math of models/clip.py's LN+MHA+residual, in Pallas interpret mode
(CPU).  Pins: bidirectional + causal masks, pad-row key masking, and
the bf16 compute path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.ops.attention_sublayer import (
    fused_attention_sublayer, fused_mlp_sublayer, pad_tokens,
    _pick_chunk, _pick_rows)


def _ref(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, heads,
         causal=False, eps=1e-5):
    """Unfused reference: exactly models/clip.py ResidualAttentionBlock
    attention half (LayerNormF32 stats in f32, softmax f32)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns + lnb).astype(dt)
    B, L, D = x.shape
    hd = D // heads
    q = (ln @ wq.astype(dt)) + bq.astype(dt)
    k = (ln @ wk.astype(dt)) + bk.astype(dt)
    v = (ln @ wv.astype(dt)) + bv.astype(dt)
    q = q.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    if causal:
        logits = logits + jnp.triu(
            jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    w = jax.nn.softmax(logits, axis=-1).astype(dt)
    out = jnp.einsum("bhls,bhsd->bhld", w, v,
                     preferred_element_type=jnp.float32).astype(dt)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
    return x + (out @ wo.astype(dt)) + bo.astype(dt)


def _weights(rng, d):
    def w():
        return jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)

    def b():
        return jnp.asarray(rng.standard_normal((d,)) * 0.01, jnp.float32)

    return dict(lns=jnp.asarray(1 + rng.standard_normal(d) * 0.1,
                                jnp.float32),
                lnb=jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32),
                wq=w(), bq=b(), wk=w(), bk=b(), wv=w(), bv=b(),
                wo=w(), bo=b())


@pytest.mark.parametrize("causal", [False, True])
def test_fused_sublayer_parity_f32(causal):
    rng = np.random.default_rng(0)
    B, L, D, H = 4, 10, 64, 4
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    wts = _weights(rng, D)
    want = _ref(x, wts["lns"], wts["lnb"], wts["wq"], wts["bq"],
                wts["wk"], wts["bk"], wts["wv"], wts["bv"],
                wts["wo"], wts["bo"], H, causal=causal)
    xp, l = pad_tokens(x)
    assert xp.shape[1] == 16 and l == L
    got = fused_attention_sublayer(
        xp, wts["lns"], wts["lnb"], wts["wq"], wts["bq"], wts["wk"],
        wts["bk"], wts["wv"], wts["bv"], wts["wo"], wts["bo"],
        heads=H, valid_len=L, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, :L]), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # pad rows exist but never poison real rows (masked as keys)
    assert np.isfinite(np.asarray(got)).all()


def test_fused_sublayer_parity_bf16():
    rng = np.random.default_rng(1)
    B, L, D, H = 2, 12, 64, 4
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    wts = _weights(rng, D)
    want = _ref(x, wts["lns"], wts["lnb"], wts["wq"], wts["bq"],
                wts["wk"], wts["bk"], wts["wv"], wts["bv"],
                wts["wo"], wts["bo"], H)
    xp, l = pad_tokens(x)
    got = fused_attention_sublayer(
        xp, wts["lns"], wts["lnb"], wts["wq"], wts["bq"], wts["wk"],
        wts["bk"], wts["wv"], wts["bv"], wts["wo"], wts["bo"],
        heads=H, valid_len=L, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got[:, :L], np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05)


def _mlp_ref(x, lns, lnb, w1, b1, w2, b2, eps=1e-5):
    """Unfused reference: models/clip.py ResidualAttentionBlock MLP half
    (LayerNormF32 stats f32, quick_gelu, fp32 GEMM accumulation)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns + lnb).astype(dt)
    h = (jnp.dot(ln, w1.astype(dt), preferred_element_type=jnp.float32)
         + b1).astype(dt)
    h = h * jax.nn.sigmoid(1.702 * h)
    y = (jnp.dot(h, w2.astype(dt), preferred_element_type=jnp.float32)
         + b2).astype(dt)
    return x + y


def _mlp_weights(rng, d):
    return dict(
        lns=jnp.asarray(1 + rng.standard_normal(d) * 0.1, jnp.float32),
        lnb=jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32),
        w1=jnp.asarray(rng.standard_normal((d, 4 * d)) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.standard_normal(4 * d) * 0.01, jnp.float32),
        w2=jnp.asarray(rng.standard_normal((4 * d, d)) * 0.05, jnp.float32),
        b2=jnp.asarray(rng.standard_normal(d) * 0.01, jnp.float32))


@pytest.mark.parametrize("shape", [(4, 10, 64), (96, 64)])
def test_fused_mlp_parity_f32(shape):
    rng = np.random.default_rng(2)
    d = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = _mlp_weights(rng, d)
    want = _mlp_ref(x, w["lns"], w["lnb"], w["w1"], w["b1"],
                    w["w2"], w["b2"])
    got = fused_mlp_sublayer(x, w["lns"], w["lnb"], w["w1"], w["b1"],
                             w["w2"], w["b2"], interpret=True)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_parity_bf16():
    rng = np.random.default_rng(3)
    B, L, D = 2, 12, 64
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    w = _mlp_weights(rng, D)
    want = _mlp_ref(x, w["lns"], w["lnb"], w["w1"], w["b1"],
                    w["w2"], w["b2"])
    got = fused_mlp_sublayer(x, w["lns"], w["lnb"], w["w1"], w["b1"],
                             w["w2"], w["b2"], interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05)


def test_pick_rows():
    assert _pick_rows(1024) == 512            # cap, multiple of 16
    assert _pick_rows(96) == 96               # whole thing, one block
    assert _pick_rows(100) == 112             # no divisor: caller pads
    assert _pick_rows(7700) == 512            # n=77*100: pad, never one
    for n in [16, 96, 100, 512, 1024, 800, 7700]:  # block of n rows
        r = _pick_rows(n)
        assert r % 16 == 0 and r <= 512


def test_fused_mlp_nondivisor_rows():
    """n with no 16-aligned divisor takes the pad-rows path; outputs
    still match the reference exactly (pad rows sliced off)."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((100, 64)), jnp.float32)
    w = _mlp_weights(rng, 64)
    want = _mlp_ref(x, w["lns"], w["lnb"], w["w1"], w["b1"],
                    w["w2"], w["b2"])
    got = fused_mlp_sublayer(x, w["lns"], w["lnb"], w["w1"], w["b1"],
                             w["w2"], w["b2"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_gradients():
    """The fused sublayer trains: its custom vjp is the reference
    math's, so grads match the unfused path to fp32 tolerance."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 10, 64)), jnp.float32)
    w = _mlp_weights(rng, 64)
    args = (x, w["lns"], w["lnb"], w["w1"], w["b1"], w["w2"], w["b2"])

    def loss_fused(*a):
        return jnp.sum(jnp.sin(fused_mlp_sublayer(*a, interpret=True)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_mlp_ref(*a)))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_attention_gradients(causal):
    rng = np.random.default_rng(8)
    B, L, D, H = 2, 10, 64, 4
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    wts = _weights(rng, D)
    xp, l = pad_tokens(x)
    keys = ["lns", "lnb", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"]
    args = (xp,) + tuple(wts[k] for k in keys)

    def loss_fused(*a):
        y = fused_attention_sublayer(*a, heads=H, valid_len=L,
                                     causal=causal, interpret=True)
        return jnp.sum(jnp.sin(y[:, :L]))

    def loss_ref(xp_, *ws):
        y = _ref(xp_[:, :L], *ws, H, causal=causal)
        return jnp.sum(jnp.sin(y))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(11)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(11)))(*args)
    # pad-row input grads are zero (their outputs are never read)
    np.testing.assert_allclose(np.asarray(g_fused[0][:, L:]), 0.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused[0][:, :L]),
                               np.asarray(g_ref[0][:, :L]),
                               rtol=1e-4, atol=1e-4)
    for gf, gr in zip(g_fused[1:], g_ref[1:]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_pick_chunk_divides_batch():
    assert _pick_chunk(256, 64) == 8          # 512-row budget
    assert _pick_chunk(6, 80) == 6            # 480 rows <= 512
    assert _pick_chunk(7, 512) == 1
    for b, lp in [(3, 64), (12, 80), (256, 64)]:
        g = _pick_chunk(b, lp)
        assert b % g == 0 and g * lp <= max(512, lp)


# ---- compact flat-rows kernel (no pad rows; r4 headline layout) ----

from cross_modal_video_engine_tpu.ops.attention_sublayer import (  # noqa: E402
    fused_attention_sublayer_compact, _compact_chunk)


def test_compact_chunk_rules():
    # L=50 (ViT-B/32 vision): smallest g with g*L a 16-multiple in
    # [256, 512] rows is 8
    assert _compact_chunk(256, 50) == 8
    # L=77 (text): g=16 -> 1232 rows > 512 -> no compact chunking
    assert _compact_chunk(256, 77) is None
    # L already a 16-multiple: g grows until >= 256 rows
    assert _compact_chunk(256, 64) == 4
    # feasible-but-small fallback when min_rows is unreachable
    assert _compact_chunk(2, 16) == 2
    # b=1 at L=50: 50 rows is not a sublane multiple -> None
    assert _compact_chunk(1, 50) is None
    for b, l in [(256, 50), (64, 32), (16, 48)]:
        g = _compact_chunk(b, l)
        assert b % g == 0 and (g * l) % 16 == 0 and g * l <= 512


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 0.05)])
def test_compact_parity(causal, dtype, tol):
    """Compact kernel == unfused reference at an L that is NOT a
    sublane multiple (the case it exists for)."""
    rng = np.random.default_rng(11)
    B, L, D, H = 8, 10, 64, 4           # g*L=80 not 16-aligned for g<8
    g = _compact_chunk(B, L)
    assert g == 8 and (g * L) % 16 == 0
    x = jnp.asarray(rng.standard_normal((B, L, D)), dtype)
    wts = _weights(rng, D)
    want = _ref(x, wts["lns"], wts["lnb"], wts["wq"], wts["bq"],
                wts["wk"], wts["bk"], wts["wv"], wts["bv"],
                wts["wo"], wts["bo"], H, causal=causal)
    got = fused_attention_sublayer_compact(
        x.reshape(B * L, D), wts["lns"], wts["lnb"], wts["wq"],
        wts["bq"], wts["wk"], wts["bk"], wts["wv"], wts["bv"],
        wts["wo"], wts["bo"], heads=H, seq_len=L, g=g, causal=causal,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.reshape(B, L, D), np.float32),
        np.asarray(want, np.float32), rtol=tol, atol=tol)


def test_compact_multi_grid_steps():
    """n_seqs > g exercises the grid dimension (several row blocks)."""
    rng = np.random.default_rng(12)
    B, L, D, H = 64, 10, 64, 2
    g = _compact_chunk(B, L)
    assert g == 32 and B // g == 2
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    wts = _weights(rng, D)
    want = _ref(x, wts["lns"], wts["lnb"], wts["wq"], wts["bq"],
                wts["wk"], wts["bk"], wts["wv"], wts["bv"],
                wts["wo"], wts["bo"], H)
    got = fused_attention_sublayer_compact(
        x.reshape(B * L, D), wts["lns"], wts["lnb"], wts["wq"],
        wts["bq"], wts["wk"], wts["bk"], wts["wv"], wts["bv"],
        wts["wo"], wts["bo"], heads=H, seq_len=L, g=g,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got.reshape(B, L, D)),
                               np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_compact_gradients(causal):
    """The compact custom_vjp produces the reference grads for x AND
    every weight (flat-x cotangent plumbing)."""
    rng = np.random.default_rng(13)
    B, L, D, H = 8, 10, 64, 4
    g = _compact_chunk(B, L)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    wts = _weights(rng, D)
    keys = ["lns", "lnb", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"]
    args = (x.reshape(B * L, D),) + tuple(wts[k] for k in keys)

    def loss_fused(*a):
        y = fused_attention_sublayer_compact(
            *a, heads=H, seq_len=L, g=g, causal=causal, interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(xf, *ws):
        y = _ref(xf.reshape(B, L, D), *ws, H, causal=causal)
        return jnp.sum(jnp.sin(y))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(11)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(11)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# whole-block kernel (attn + MLP in one pallas_call)
# ---------------------------------------------------------------------------

def _block_mlp_weights(rng, d, dh=None):
    dh = dh or 4 * d
    return dict(
        ln2s=jnp.asarray(1 + rng.standard_normal(d) * 0.1, jnp.float32),
        ln2b=jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32),
        w1=jnp.asarray(rng.standard_normal((d, dh)) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.standard_normal(dh) * 0.01, jnp.float32),
        w2=jnp.asarray(rng.standard_normal((dh, d)) * 0.05, jnp.float32),
        b2=jnp.asarray(rng.standard_normal(d) * 0.01, jnp.float32))


_ATTN_KEYS = ["lns", "lnb", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"]
_MLP_KEYS = ["ln2s", "ln2b", "w1", "b1", "w2", "b2"]


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 0.08)])
def test_block_parity(causal, dtype, tol):
    """Whole-block kernel == compact attn sublayer -> MLP sublayer
    (its documented contract), multi-grid-step."""
    from cross_modal_video_engine_tpu.ops.attention_sublayer import (
        _compact_chunk, fused_attention_sublayer_compact,
        fused_block_sublayer_compact, fused_mlp_sublayer)
    rng = np.random.default_rng(21)
    B, L, D, H = 16, 10, 64, 4
    g = _compact_chunk(B, L, max_rows=80)    # B//g = 2 grid steps
    x = jnp.asarray(rng.standard_normal((B * L, D)), dtype)
    wa = _weights(rng, D)
    wm = _block_mlp_weights(rng, D)
    y1 = fused_attention_sublayer_compact(
        x, *[wa[k] for k in _ATTN_KEYS], heads=H, seq_len=L, g=g,
        causal=causal, interpret=True)
    want = fused_mlp_sublayer(y1, *[wm[k] for k in _MLP_KEYS],
                              interpret=True)
    got = fused_block_sublayer_compact(
        x, *[wa[k] for k in _ATTN_KEYS], *[wm[k] for k in _MLP_KEYS],
        heads=H, seq_len=L, g=g, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_block_gradients():
    """Block custom_vjp == grads of the chained reference math for x
    and all 16 weights."""
    from cross_modal_video_engine_tpu.ops.attention_sublayer import (
        _compact_chunk, _block_ref_flat, fused_block_sublayer_compact)
    rng = np.random.default_rng(22)
    B, L, D, H = 8, 10, 64, 4
    g = _compact_chunk(B, L)
    x = jnp.asarray(rng.standard_normal((B * L, D)), jnp.float32)
    wa = _weights(rng, D)
    wm = _block_mlp_weights(rng, D)
    args = (x,) + tuple(wa[k] for k in _ATTN_KEYS) \
        + tuple(wm[k] for k in _MLP_KEYS)

    def loss_fused(*a):
        y = fused_block_sublayer_compact(
            *a, heads=H, seq_len=L, g=g, interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(*a):
        y = _block_ref_flat(*a, heads=H, seq_len=L, causal=False,
                            eps=1e-5)
        return jnp.sum(jnp.sin(y))

    gf = jax.grad(loss_fused, argnums=tuple(range(17)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(17)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
