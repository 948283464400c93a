import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.tin_mobilenet import (
    MobileNetV2TSM, MobileNetV2TSMConfig, TemporalInterlace, TINConfig,
    TINResNet)
from cross_modal_video_engine_tpu.models.bsn import (
    PEM, TEM, match_boundaries, proposal_features)

rng = np.random.default_rng(521)


def test_temporal_interlace_shapes_and_learned_offset():
    m = TemporalInterlace(channels=8, shift_div=4, groups=2)
    x = jnp.asarray(rng.standard_normal((2, 6, 4, 4, 8)), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    out = m.apply(variables, x)
    assert out.shape == x.shape
    # unshifted channels pass through untouched
    np.testing.assert_allclose(np.asarray(out[..., 2:]),
                               np.asarray(x[..., 2:]))
    assert np.isfinite(np.asarray(out)).all()


def test_tin_resnet_forward():
    cfg = TINConfig(stage_blocks=(1, 1), base_channels=8)
    m = TINResNet(cfg)
    v = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    assert out.shape == (1, 4, 8 * 2 * 4)
    assert np.isfinite(np.asarray(out)).all()


def test_mobilenet_v2_tsm():
    cfg = MobileNetV2TSMConfig(
        stages=((1, 8, 1, 1), (6, 16, 2, 2)), last_channels=32)
    m = MobileNetV2TSM(cfg)
    v = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), v)
    out = m.apply(variables, v)
    assert out.shape == (1, 4, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_bsn_tem_pem_and_pgm():
    tem = TEM(hidden=16)
    x = jnp.asarray(rng.standard_normal((1, 30, 8)), jnp.float32)
    variables = tem.init(jax.random.key(0), x)
    out = tem.apply(variables, x)
    assert out["action"].shape == (1, 30)
    assert ((0 <= np.asarray(out["start"]))
            & (np.asarray(out["start"]) <= 1)).all()

    # synthetic peaky boundaries
    start = np.zeros(30); start[5] = 0.9; start[6] = 0.3
    end = np.zeros(30); end[20] = 0.8; end[25] = 0.6
    props = match_boundaries(start, end)
    assert len(props) >= 2
    assert props[0][0] == 5 and props[0][1] == 20   # strongest pair first
    assert (props[:, 1] > props[:, 0]).all()

    action = rng.random(30)
    feats = proposal_features(action, props)
    assert feats.shape == (len(props), 16 + 8)

    pem = PEM(hidden=8)
    pv = pem.init(jax.random.key(1), jnp.asarray(feats))
    conf = pem.apply(pv, jnp.asarray(feats))
    assert conf.shape == (len(props),)
    assert ((0 <= np.asarray(conf)) & (np.asarray(conf) <= 1)).all()
