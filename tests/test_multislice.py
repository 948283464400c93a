"""Multi-slice (dcn, data, model) mesh: placement, uneven-slice guard,
and a dp-over-dcn train step (the TPU analogue of the reference's
multi-node launchers, MCT/tools/dist_train.sh NNODES/NODE_RANK)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cross_modal_video_engine_tpu.parallel.mesh import (
    data_sharding, make_multislice_mesh, shard_rows)
from cross_modal_video_engine_tpu.parallel.shardings import (
    batch_spec, opt_state_shardings, partition_params)


def _fake_slices(per_slice):
    # CPU virtual devices have no slice_index; fake 8 -> slices of
    # `per_slice` by device id
    return lambda d: d.id // per_slice


def test_multislice_mesh_placement():
    mesh = make_multislice_mesh(slice_index_fn=_fake_slices(4))
    assert mesh.axis_names == ("dcn", "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 4, "model": 1}
    # every row of the dcn axis holds exactly one slice's devices
    for row, ids in [(0, {0, 1, 2, 3}), (1, {4, 5, 6, 7})]:
        assert {d.id for d in mesh.devices[row].ravel()} == ids


def test_multislice_mesh_with_model_axis():
    mesh = make_multislice_mesh(n_model=2, slice_index_fn=_fake_slices(4))
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    # model-axis pairs never straddle slices (tensor collectives must
    # stay on ICI)
    for row in range(2):
        for pair in mesh.devices[row]:
            slices = {d.id // 4 for d in pair}
            assert len(slices) == 1


def test_multislice_uneven_slices_rejected():
    with pytest.raises(AssertionError, match="uneven devices per slice"):
        make_multislice_mesh(slice_index_fn=lambda d: 0 if d.id < 3 else 1)


def test_multislice_model_axis_too_wide_rejected():
    with pytest.raises(AssertionError, match="cannot cross DCN"):
        make_multislice_mesh(n_model=8, slice_index_fn=_fake_slices(4))


def test_multislice_model_axis_indivisible_rejected():
    """n_model=3 on 4-device slices: silently truncating to 1x3 per dcn
    row would pull slice-1 devices into row 0 and 'model' collectives
    would straddle DCN (r4 review fix)."""
    with pytest.raises(AssertionError, match="does not divide"):
        make_multislice_mesh(n_model=3, slice_index_fn=_fake_slices(4))


def test_multislice_batch_spec_and_shard_rows():
    mesh = make_multislice_mesh(slice_index_fn=_fake_slices(4))
    spec = batch_spec(mesh)
    assert spec.spec == jax.sharding.PartitionSpec(("dcn", "data"))
    # shard_rows pads to dcn*data (8), not just data (4)
    x, n = shard_rows(mesh, np.ones((10, 3), np.float32))
    assert n == 10 and x.shape[0] == 16
    assert data_sharding(mesh, 2).spec[0] == ("dcn", "data")


def test_multislice_retrieval_index_self_hits():
    """RetrievalIndex on a (dcn, data, model) mesh: rows shard jointly
    over both leading axes and per-shard base offsets stay correct
    (regression: base used axis_index('data') only, returning wrong
    global row ids on multi-slice meshes)."""
    from cross_modal_video_engine_tpu.retrieval.index import RetrievalIndex
    mesh = make_multislice_mesh(slice_index_fn=_fake_slices(4))
    rng = np.random.default_rng(3)
    base = rng.standard_normal((256, 32)).astype(np.float32)
    idx = RetrievalIndex(base, mesh=mesh, capacity=256)
    assert idx.n_shards == 8
    q_rows = [0, 31, 128, 255]         # spread across both slices
    scores, ids = idx.search(base[q_rows], k=5)
    assert [int(i[0]) for i in ids] == q_rows
    assert np.isfinite(scores).all()


def test_multislice_dp_train_step_matches_single_device():
    """One dp-over-dcn train step: gradients psum across both ('dcn',
    'data') — i.e. one DCN crossing — and the update matches the
    single-device computation bit-for-bit in fp32 tolerance."""
    mesh = make_multislice_mesh(slice_index_fn=_fake_slices(4))
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((6, 4)) * 0.1, jnp.float32)
    b = jnp.zeros((4,), jnp.float32)
    params = {"dense": {"kernel": W, "bias": b}}
    x = jnp.asarray(rng.standard_normal((16, 6)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (16,)), jnp.int32)
    tx = optax.sgd(0.1)

    def loss_fn(p, x, y):
        logits = x @ p["dense"]["kernel"] + p["dense"]["bias"]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    def step(p, o, x, y):
        l, g = jax.value_and_grad(loss_fn)(p, x, y)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    # single-device reference
    opt0 = tx.init(params)
    ref_params, _, ref_loss = jax.jit(step)(params, opt0, x, y)

    ps = partition_params(params, mesh)
    oss = opt_state_shardings(tx.init(params), params, mesh)
    bspec = batch_spec(mesh)
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    jstep = jax.jit(step, in_shardings=(ps, oss, bspec, bspec),
                    out_shardings=(ps, oss, repl))
    with mesh:
        ms_params, _, ms_loss = jstep(
            jax.device_put(params, ps),
            jax.device_put(tx.init(params), oss),
            jax.device_put(x, bspec), jax.device_put(y, bspec))
    np.testing.assert_allclose(float(ms_loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ms_params["dense"]["kernel"]),
        np.asarray(ref_params["dense"]["kernel"]), rtol=1e-5)


class _TinyBNNet(__import__("flax").linen.Module):
    """Minimal BatchNorm classifier for the dp-stats semantics test."""
    n_classes: int = 4

    @__import__("flax").linen.compact
    def __call__(self, videos, train: bool = False):
        import flax.linen as nn
        x = nn.Conv(8, (3, 3))(videos)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9)(x)
        x = nn.relu(x).mean(axis=(1, 2))
        return nn.Dense(self.n_classes)(x)


def test_bn_batch_stats_global_under_dp():
    """BatchNorm statistics under dp must be GLOBAL-batch statistics:
    the GSPMD analogue of the reference's SyncBN /
    SubBatchNorm3dAggregation (MCT mmaction SyncBN requires_grad
    configs; multigrid/subbn_aggregate.py).  jit inserts the cross-
    device all-reduce for the batch-axis mean/var automatically, so a
    dp-sharded step must reproduce the single-device step exactly."""
    import optax

    from cross_modal_video_engine_tpu.train.recognition_trainer import (
        RecTrainState, make_cls_train_step_stats)

    model = _TinyBNNet()
    rng = np.random.default_rng(11)
    videos = rng.standard_normal((16, 6, 6, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 16)
    variables = model.init(jax.random.key(0), videos[:1], train=False)
    tx = optax.sgd(0.1)
    state0 = RecTrainState(variables["params"],
                           tx.init(variables["params"]), 0)
    step = make_cls_train_step_stats(model, tx)
    key = jax.random.key(1)

    # single-device reference (global-batch statistics by construction)
    ref_state, ref_stats, ref_m = step(
        state0, variables["batch_stats"], jnp.asarray(videos),
        jnp.asarray(labels), key)

    # dp over all 8 virtual devices: videos/labels row-sharded
    mesh = make_multislice_mesh()  # (1, 8, 1) on the CPU mesh
    v_sh, _ = shard_rows(mesh, videos)
    l_sh, _ = shard_rows(mesh, labels)
    dp_state, dp_stats, dp_m = step(
        state0, variables["batch_stats"], v_sh, l_sh, key)

    np.testing.assert_allclose(float(dp_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    for ref_leaf, dp_leaf in zip(jax.tree.leaves(ref_stats),
                                 jax.tree.leaves(dp_stats)):
        np.testing.assert_allclose(np.asarray(dp_leaf),
                                   np.asarray(ref_leaf), atol=1e-5)
    for ref_leaf, dp_leaf in zip(jax.tree.leaves(ref_state.params),
                                 jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(dp_leaf),
                                   np.asarray(ref_leaf), atol=1e-5)

    # and the statistics really are global: per-shard stats differ
    half_m, half_v = (np.asarray(model.apply(
        variables, jnp.asarray(videos[:8]), train=True,
        mutable=["batch_stats"])[1]["batch_stats"]["BatchNorm_0"][k])
        for k in ("mean", "var"))
    glob_m = np.asarray(ref_stats["BatchNorm_0"]["mean"])
    assert not np.allclose(half_m, glob_m, atol=1e-6), (
        "test fixture degenerate: half-batch stats equal global stats")
