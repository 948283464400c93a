import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_modal_video_engine_tpu.models.tanet import TAM, TANet, TANetConfig
from cross_modal_video_engine_tpu.data.prefetch import prefetch

rng = np.random.default_rng(501)


def test_tam_adaptive_kernel():
    tam = TAM(channels=8, kernel=3)
    x = jnp.asarray(rng.standard_normal((2, 6, 4, 4, 8)), jnp.float32)
    variables = tam.init(jax.random.key(0), x)
    out = tam.apply(variables, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # the temporal kernel is adaptive (input-dependent): time-reversing the
    # input does not simply time-reverse the output
    out_rev = tam.apply(variables, x[:, ::-1])
    assert not np.allclose(np.asarray(out_rev)[:, ::-1], np.asarray(out),
                           atol=1e-5)


def test_tanet_forward():
    cfg = TANetConfig(stage_blocks=(1, 1), base_channels=8)
    m = TANet(cfg)
    v = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    assert out.shape == (1, 4, 8 * 2 * 4)
    assert np.isfinite(np.asarray(out)).all()


def test_prefetch_order_and_overlap():
    def slow_source():
        for i in range(5):
            time.sleep(0.02)
            yield np.full((2, 2), i, np.float32)

    got = list(prefetch(slow_source(), depth=2, device_put=True))
    assert len(got) == 5
    for i, b in enumerate(got):
        assert float(np.asarray(b)[0, 0]) == i
    assert hasattr(got[0], "devices")        # actually placed on device


def test_prefetch_propagates_errors():
    def bad_source():
        yield np.zeros(2)
        raise ValueError("decode failed")

    it = prefetch(bad_source(), device_put=False)
    next(it)
    with pytest.raises(ValueError, match="decode failed"):
        next(it)
