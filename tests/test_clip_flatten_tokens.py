"""CLIPConfig.flatten_tokens: the (B*L, D) per-token layout must be
numerically identical to the rank-3 layout with the same params (exact
math — only the tile padding changes), for both towers."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.full    # full lane: the flatten_tokens layout is superseded by the shipped fused compact path (enable_fused_inference), which has its own default-lane tests

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.clip import CLIPConfig, CLIPModel

CFG = CLIPConfig(embed_dim=32, image_resolution=64, vision_width=48,
                 vision_layers=2, vision_heads=4, patch_size=16,
                 context_length=12, vocab_size=96, text_width=40,
                 text_heads=4, text_layers=2)


@pytest.fixture(scope="module")
def setup():
    model = CLIPModel(CFG)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 96, (3, 12)), jnp.int32)
    variables = model.init(jax.random.key(0), images, ids)
    return model, variables, images, ids


def test_flatten_tokens_param_tree_identical(setup):
    model, variables, images, ids = setup
    flat_model = CLIPModel(dataclasses.replace(CFG, flatten_tokens=True))
    vflat = flat_model.init(jax.random.key(0), images, ids)
    assert jax.tree.structure(vflat) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(vflat), jax.tree.leaves(variables)):
        assert a.shape == b.shape


def test_flatten_tokens_vision_parity(setup):
    model, variables, images, ids = setup
    flat_model = CLIPModel(dataclasses.replace(CFG, flatten_tokens=True))
    high, mid = model.apply(variables, images, method="encode_image")
    fh, fm = flat_model.apply(variables, images, method="encode_image")
    np.testing.assert_allclose(np.asarray(fh), np.asarray(high),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(mid),
                               rtol=1e-5, atol=1e-5)


def test_flatten_tokens_text_parity(setup):
    model, variables, images, ids = setup
    flat_model = CLIPModel(dataclasses.replace(CFG, flatten_tokens=True))
    t = model.apply(variables, ids, method="encode_text")
    ft = flat_model.apply(variables, ids, method="encode_text")
    np.testing.assert_allclose(np.asarray(ft), np.asarray(t),
                               rtol=1e-5, atol=1e-5)


def test_flatten_tokens_video_parity(setup):
    model, variables, images, ids = setup
    flat_model = CLIPModel(dataclasses.replace(CFG, flatten_tokens=True))
    rng = np.random.default_rng(1)
    vids = jnp.asarray(rng.standard_normal((2, 3, 64, 64, 3)), jnp.float32)
    high, _ = model.apply(variables, vids, method="encode_video")
    fh, _ = flat_model.apply(variables, vids, method="encode_video")
    np.testing.assert_allclose(np.asarray(fh), np.asarray(high),
                               rtol=1e-5, atol=1e-5)
