import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.stgcn import (
    STGCN, STGCNConfig, build_partitioned_adjacency)
from cross_modal_video_engine_tpu.models.bmn import (
    BMN, BMNConfig, bm_sampling_matrix, generate_proposals, soft_nms)

rng = np.random.default_rng(461)


def test_adjacency_partition():
    A = build_partitioned_adjacency(17)
    assert A.shape == (3, 17, 17)
    # subsets are disjoint and their sum is the normalized adjacency
    overlap = (A[0] > 0).astype(int) + (A[1] > 0) + (A[2] > 0)
    assert overlap.max() == 1
    # identity subset covers the diagonal
    assert (np.diagonal(A[0]) > 0).all()


def test_stgcn_forward():
    cfg = STGCNConfig(channels=(8, 16), temporal_strides=(1, 2))
    m = STGCN(cfg)
    kp = jnp.asarray(rng.standard_normal((2, 16, 17, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), kp)
    out = m.apply(variables, kp)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_bm_sampling_matrix_weights():
    W = bm_sampling_matrix(T=10, N=4, D=5).reshape(10, 4, 5, 10)
    # each sample's interpolation weights sum to 1 (when in range)
    s = W[:, 0, 0, 0].sum()      # first sample of proposal (t=0, d=0)
    assert abs(s - 1.0) < 1e-5


def test_bmn_forward_and_postprocess():
    cfg = BMNConfig(temporal_dim=20, feat_dim=16, num_samples=8,
                    max_duration=20, hidden_1d=16, hidden_2d=8, hidden_3d=16)
    m = BMN(cfg)
    f = jnp.asarray(rng.standard_normal((1, 20, 16)), jnp.float32)
    variables = m.init(jax.random.key(0), f)
    out = m.apply(variables, f)
    assert out["tem_start"].shape == (1, 20)
    assert out["pem_reg"].shape == (1, 20, 20)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())

    props = generate_proposals(np.asarray(out["tem_start"][0]),
                               np.asarray(out["tem_end"][0]),
                               np.asarray(out["pem_reg"][0]),
                               np.asarray(out["pem_cls"][0]))
    assert props.shape[1] == 3
    assert (props[:-1, 2] >= props[1:, 2]).all()     # sorted by score

    kept = soft_nms(props, top_k=10)
    assert len(kept) <= 10
    # soft-NMS keeps the global best first
    np.testing.assert_allclose(kept[0, 2], props[0, 2])
