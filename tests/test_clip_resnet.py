import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.clip_resnet import (
    AttentionPool2d, ModifiedResNet, ModifiedResNetConfig)

rng = np.random.default_rng(77)


@pytest.mark.full    # full lane: shape probe; the RN50x4 conversion parity test covers
# the exact structure
def test_modified_resnet_shapes():
    cfg = ModifiedResNetConfig(layers=(1, 1, 1, 1), width=16, output_dim=32,
                               heads=4, image_resolution=64, middle_stage=2)
    model = ModifiedResNet(cfg)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    high, middle = model.apply(variables, x)
    # stem /4, layer2 /2 -> middle at /8 with 8*width channels
    assert middle.shape == (2, 8, 8, 16 * 8)
    assert high.shape == (2, 32)
    assert np.isfinite(np.asarray(high)).all()
    assert "batch_stats" in variables


@pytest.mark.full    # full lane: importer-parity detail; the composed e2e + combiner GT-parity consume (high,middle) default
def test_modified_resnet_middle_stage3():
    cfg = ModifiedResNetConfig(layers=(1, 1, 1, 1), width=16, output_dim=32,
                               heads=4, image_resolution=64, middle_stage=3)
    model = ModifiedResNet(cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    _, middle = model.apply(variables, x)
    assert middle.shape == (1, 4, 4, 16 * 16)


def test_attention_pool_permutation_of_query():
    """The pooled output is built from the mean query token, so permuting
    spatial positions changes only via pos-emb (not the value content)."""
    pool = AttentionPool2d(embed_dim=16, heads=4, output_dim=8)
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 16)), jnp.float32)
    variables = pool.init(jax.random.key(0), x)
    out = pool.apply(variables, x)
    assert out.shape == (1, 8)
    assert np.isfinite(np.asarray(out)).all()
