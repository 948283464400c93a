import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_modal_video_engine_tpu.models.resnet3d import (
    ResNet3D, ResNet3DConfig, SlowFast, SlowFastConfig, X3D, X3DConfig)
from cross_modal_video_engine_tpu.models.heads import (
    I3DHead, SlowFastHead, TSNHead, X3DHead)

rng = np.random.default_rng(131)


def _v(B=2, T=8, S=32):
    return jnp.asarray(rng.standard_normal((B, T, S, S, 3)), jnp.float32)


def test_resnet3d_slowonly_shapes():
    cfg = ResNet3DConfig(stage_blocks=(1, 1, 1, 1), base_channels=8)
    m = ResNet3D(cfg)
    v = _v()
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    assert out.shape == (2, 8 * 8 * 4)      # base * 2^3 * expansion
    stages = m.apply(variables, v, return_stages=True)
    assert len(stages) == 4
    # temporal dim preserved by SlowOnly (no temporal stride)
    assert stages[-1].shape[1] == 8


@pytest.mark.full    # full lane: shape probe; convert_slowfast parity test exercises the
# same structure against torch
def test_slowfast_two_pathways():
    cfg = SlowFastConfig(depth_blocks=(1, 1, 1, 1), alpha=4, beta_inv=8,
                         base_channels=16)
    m = SlowFast(cfg)
    v = _v(T=8)
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    slow_c = 16 * 8 * 4          # base * 2^3 * expansion
    fast_c = (16 // 8) * 8 * 4
    assert out.shape == (2, slow_c + fast_c)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.full    # full lane: shape probe; convert_x3d parity test covers the exact
# structure
def test_x3d_shapes():
    cfg = X3DConfig(stage_blocks=(1, 1, 1, 1), stage_channels=(8, 16, 24, 32),
                    feat_dim=48)
    m = X3D(cfg)
    v = _v(T=4)
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    assert out.shape == (2, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_heads():
    f = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    for head_cls in (I3DHead, SlowFastHead):
        h = head_cls(num_classes=10)
        variables = h.init(jax.random.key(0), f)
        assert h.apply(variables, f).shape == (3, 10)
    h = X3DHead(num_classes=10, mid_channels=32)
    variables = h.init(jax.random.key(0), f)
    assert h.apply(variables, f).shape == (3, 10)
    seg = jnp.asarray(rng.standard_normal((3, 5, 64)), jnp.float32)
    h = TSNHead(num_classes=10)
    variables = h.init(jax.random.key(0), seg)
    out = h.apply(variables, seg)
    assert out.shape == (3, 10)
    # consensus = mean over segments
    out_mean = h.apply(variables, seg.mean(axis=1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_mean),
                               rtol=1e-5, atol=1e-6)
