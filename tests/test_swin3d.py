import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.swin3d import (
    Swin3D, Swin3DConfig, relative_position_index, shifted_window_mask,
    window_partition, window_reverse)

rng = np.random.default_rng(401)


def test_window_partition_roundtrip():
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 5)), jnp.float32)
    w = (2, 4, 4)
    win = window_partition(x, w)
    assert win.shape == (2 * 2 * 2 * 2, 2 * 4 * 4, 5)
    back = window_reverse(win, w, 2, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_bounds():
    w = (2, 3, 3)
    idx = relative_position_index(w)
    n = 2 * 3 * 3
    assert idx.shape == (n, n)
    assert idx.min() >= 0
    assert idx.max() < (2 * 2 - 1) * (2 * 3 - 1) * (2 * 3 - 1)
    # zero offset (diagonal) maps to one single table entry
    assert len(set(idx[np.arange(n), np.arange(n)])) == 1


def test_shifted_mask_blocks_cross_region():
    dims, w, shift = (4, 8, 8), (2, 4, 4), (1, 2, 2)
    mask = shifted_window_mask(dims, w, shift)
    nW = (4 // 2) * (8 // 4) * (8 // 4)
    assert mask.shape == (nW, 32, 32)
    assert (mask <= 0).all()
    assert (mask < 0).any()          # some pairs are actually masked
    # diagonal never masked
    for i in range(mask.shape[0]):
        assert (np.diagonal(mask[i]) == 0).all()


@pytest.mark.full    # full lane: forward probe; the Swin3D importer parity test covers
# the exact structure
def test_swin3d_forward():
    cfg = Swin3DConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                       window_size=(2, 4, 4), patch_size=(2, 4, 4))
    m = Swin3D(cfg)
    v = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    assert out.shape == (2, 16)      # embed_dim * 2^(stages-1)
    assert np.isfinite(np.asarray(out)).all()


def test_swin3d_shift_changes_output():
    """With 2 blocks the second is shifted; removing the shift must change
    the computation (sanity that the shifted path is active)."""
    cfg = Swin3DConfig(embed_dim=8, depths=(2,), num_heads=(2,),
                       window_size=(2, 4, 4), patch_size=(2, 4, 4))
    m = Swin3D(cfg)
    v = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    assert np.isfinite(np.asarray(out)).all()
