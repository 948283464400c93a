import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.ssn import (
    SSNConfig, SSNHead, ssn_proposal_scores, stpp_matrix)

rng = np.random.default_rng(541)


def test_stpp_matrix_rows_average():
    props = np.array([[4.0, 12.0], [0.0, 6.0]])
    W = stpp_matrix(30, props, parts=(1, 2, 1))
    assert W.shape == (2, 1 + 2 + 1 + 2, 30)
    np.testing.assert_allclose(W.sum(-1), 1.0, rtol=1e-5)
    # the whole-span row covers [4, 12)
    assert (W[0, 0, 4:12] > 0).all() and W[0, 0, :4].sum() == 0


def test_ssn_head_and_scores():
    cfg = SSNConfig(feat_dim=16, num_classes=5, hidden=8)
    head = SSNHead(cfg)
    T = 30
    feats = jnp.asarray(rng.standard_normal((T, 16)), jnp.float32)
    props = np.array([[4.0, 12.0], [10.0, 25.0], [0.0, 29.0]])
    stpp = jnp.asarray(stpp_matrix(T, props))
    variables = head.init(jax.random.key(0), feats, stpp)
    out = head.apply(variables, feats, stpp)
    assert out["activity"].shape == (3, 6)
    assert out["completeness"].shape == (3, 5)
    assert out["regression"].shape == (3, 5, 2)

    scores = ssn_proposal_scores(np.asarray(out["activity"]),
                                 np.asarray(out["completeness"]))
    assert scores.shape == (3, 5)
    assert (scores >= 0).all() and np.isfinite(scores).all()
