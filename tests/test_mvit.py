import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.mvit import (
    MViT, MViTConfig, _PoolConv, _pool_skip)

rng = np.random.default_rng(421)


def test_pool_tokens():
    x = jnp.asarray(rng.standard_normal((1, 2 * 4 * 4, 3)), jnp.float32)
    # skip path: parameterless kernel-3 max pool
    out, grid = _pool_skip(x, (2, 4, 4), (1, 2, 2))
    assert out.shape == (1, 2 * 2 * 2, 3)
    assert grid == (2, 2, 2)
    same, g2 = _pool_skip(x, (2, 4, 4), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(same), np.asarray(x))
    # q/k/v path: learnable depthwise conv pooling, same grid math
    pool = _PoolConv((1, 2, 2), (2, 4, 4))
    vars_ = pool.init(jax.random.key(0), x)
    out2, grid2 = pool.apply(vars_, x)
    assert out2.shape == (1, 2 * 2 * 2, 3)
    assert grid2 == (2, 2, 2)
    kernel = vars_["params"]["conv"]["kernel"]
    assert kernel.shape[:3] == (3, 3, 3)   # depthwise 3x3x3


def test_mvit_forward_multiscale():
    cfg = MViTConfig(embed_dim=8, depths=(1, 1, 1), num_heads=(1, 2, 2),
                     patch_size=(2, 4, 4))
    m = MViT(cfg)
    v = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    assert out.shape == (2, 8 * 4)       # channels double per stage change
    assert np.isfinite(np.asarray(out)).all()
