"""CLIPConfig.fused_attn: the Pallas fused attention sublayer wired
into both towers must preserve the param tree exactly and match the
unfused model numerically (interpret mode on CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cross_modal_video_engine_tpu.ops.attention_sublayer as asl
from cross_modal_video_engine_tpu.models.clip import CLIPConfig, CLIPModel

CFG = CLIPConfig(embed_dim=32, image_resolution=64, vision_width=48,
                 vision_layers=2, vision_heads=4, patch_size=16,
                 context_length=12, vocab_size=96, text_width=40,
                 text_heads=4, text_layers=2)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(asl.pl, "pallas_call", patched)
    yield


@pytest.fixture(scope="module")
def setup():
    model = CLIPModel(CFG)
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 96, (3, 12)), jnp.int32)
    variables = model.init(jax.random.key(0), images, ids)
    return model, variables, images, ids


def test_fused_attn_param_tree_identical(setup):
    model, variables, images, ids = setup
    fused = CLIPModel(dataclasses.replace(CFG, fused_attn=True))
    vf = fused.init(jax.random.key(0), images, ids)
    assert jax.tree.structure(vf) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(vf), jax.tree.leaves(variables)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_fused_attn_vision_parity(setup):
    model, variables, images, ids = setup
    fused = CLIPModel(dataclasses.replace(CFG, fused_attn=True))
    high, mid = model.apply(variables, images, method="encode_image")
    fh, fm = fused.apply(variables, images, method="encode_image")
    np.testing.assert_allclose(np.asarray(fh), np.asarray(high),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(mid),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_param_tree_identical(setup):
    model, variables, images, ids = setup
    fused = CLIPModel(dataclasses.replace(CFG, fused_mlp=True))
    vf = fused.init(jax.random.key(0), images, ids)
    assert jax.tree.structure(vf) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(vf), jax.tree.leaves(variables)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.parametrize("mode", [
    dict(fused_mlp=True),
    dict(fused_mlp=True, fused_attn=True),
    dict(fused_mlp=True, flatten_tokens=True),
])
def test_fused_mlp_parity_both_towers(setup, mode):
    """fused_mlp must match the unfused model on the SAME params, alone
    and composed with each layout mode (it is purely per-token)."""
    model, variables, images, ids = setup
    fused = CLIPModel(dataclasses.replace(CFG, **mode))
    high, mid = model.apply(variables, images, method="encode_image")
    fh, fm = fused.apply(variables, images, method="encode_image")
    np.testing.assert_allclose(np.asarray(fh), np.asarray(high),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(mid),
                               rtol=2e-5, atol=2e-5)
    t = model.apply(variables, ids, method="encode_text")
    ft = fused.apply(variables, ids, method="encode_text")
    np.testing.assert_allclose(np.asarray(ft), np.asarray(t),
                               rtol=2e-5, atol=2e-5)


def test_fused_attn_flatten_refused(setup):
    """flatten_tokens + fused_attn would silently drop the flatten —
    the Transformer refuses the combination instead."""
    model, variables, images, ids = setup
    bad = CLIPModel(dataclasses.replace(CFG, fused_attn=True,
                                        flatten_tokens=True))
    with pytest.raises(AssertionError, match="mutually exclusive"):
        bad.apply(variables, images, method="encode_image")


def test_fused_modes_train(setup):
    """The fused sublayers are differentiable (custom vjp over the
    reference math): grads through the full fused model match the
    unfused model's on the same params."""
    model, variables, images, ids = setup
    fused = CLIPModel(dataclasses.replace(CFG, fused_attn=True,
                                          fused_mlp=True))

    def loss(m):
        def f(v):
            high, _ = m.apply(v, images, method="encode_image")
            t = m.apply(v, ids, method="encode_text")
            return jnp.sum(jnp.sin(high)) + jnp.sum(jnp.sin(t))
        return f

    g_ref = jax.grad(loss(model))(variables)
    g_fused = jax.grad(loss(fused))(variables)
    ref_leaves = jax.tree.leaves(g_ref)
    for gf, gr in zip(jax.tree.leaves(g_fused), ref_leaves):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4)
    assert len(ref_leaves) == len(jax.tree.leaves(g_fused))


def test_fused_attn_text_parity_causal(setup):
    """The text tower's triangular mask must be reproduced by the
    kernel's causal path (EOT pooling reads mid-sequence rows)."""
    model, variables, images, ids = setup
    fused = CLIPModel(dataclasses.replace(CFG, fused_attn=True))
    t = model.apply(variables, ids, method="encode_text")
    ft = fused.apply(variables, ids, method="encode_text")
    np.testing.assert_allclose(np.asarray(ft), np.asarray(t),
                               rtol=2e-5, atol=2e-5)


def test_enable_fused_inference_auto(monkeypatch):
    """Serving CLIs flip the fused flags on for TPU backends only
    (exact math, identical param tree — checkpoint configs without the
    flags still load)."""
    import jax
    from cross_modal_video_engine_tpu.models.clip import (
        CLIPConfig, enable_fused_inference)
    cfg = CLIPConfig(dtype="bfloat16")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert enable_fused_inference(cfg) is cfg
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    on = enable_fused_inference(cfg)
    assert on.fused_attn and on.fused_mlp
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    on = enable_fused_inference(cfg)
    assert on.fused_attn and on.fused_mlp
    # explicit override beats auto
    off = enable_fused_inference(cfg, enable=False)
    assert not off.fused_attn and not off.fused_mlp
    # geometry guard: ViT-L/14-class widths (D=1024) exceed the fused
    # MLP kernel's VMEM weight budget — auto stays off on TPU
    import dataclasses
    wide = dataclasses.replace(cfg, vision_width=1024, vision_heads=16)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert enable_fused_inference(wide) is wide
    # explicit enable still wins (caller takes responsibility)
    assert enable_fused_inference(wide, enable=True).fused_attn
    # a checkpoint saved with flatten_tokens=True must load fused
    # without tripping the Transformer's mutual-exclusion assert:
    # the fused layout supersedes flatten_tokens, so it is cleared
    flat = dataclasses.replace(cfg, flatten_tokens=True)
    on = enable_fused_inference(flat)
    assert on.fused_attn and on.fused_mlp and not on.flatten_tokens


def test_compact_kernel_rejects_nondividing_g():
    """fused_attention_sublayer_compact is a public entry point — a g
    that does not divide the sequence count must raise, not silently
    leave trailing output rows unwritten."""
    import jax.numpy as jnp
    import pytest
    from cross_modal_video_engine_tpu.ops.attention_sublayer import (
        _attn_pallas_compact)
    d, heads, l = 64, 4, 10
    n = 3 * l  # 3 sequences; g=2 does not divide 3
    x = jnp.zeros((n, d), jnp.float32)
    w = jnp.zeros((d, d), jnp.float32)
    b = jnp.zeros((d,), jnp.float32)
    one = jnp.ones((d,), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        _attn_pallas_compact(x, one, b, w, b, w, b, w, b, w, b,
                             heads=heads, seq_len=l, g=2, causal=False,
                             eps=1e-5, interpret=True)
