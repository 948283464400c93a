"""Real consumers for pipeline and expert parallelism:
* pipelined TimeSformer tower (parallel/pipeline_models.py) matches the
  single-chip forward exactly and trains through the pipeline;
* MoEVideoClassifier (models/moe_video.py) trains with expert-parallel
  FFN layers and its expert weights actually shard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from cross_modal_video_engine_tpu.models.moe_video import (
    MoEVideoClassifier, MoEVideoConfig, make_moe_train_step,
    moe_param_shardings)
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3D
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.parallel.pipeline_models import (
    pipelined_cls_forward, pipelined_cls_loss, pipelined_timesformer_tokens)

rng = np.random.default_rng(17)

TS_KW = dict(num_frames=4, img_size=16, patch_size=8, embed_dims=32,
             num_heads=2, num_layers=4, drop_path_max=0.0,
             dropout_ratio=0.0)


def _stage_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("stage",))


@pytest.mark.full    # full lane: 26s parity loop; the driver dryrun runs the
# pipeline stage every round and test_moe_expert_parallel stays default
def test_pipelined_tower_matches_single_chip():
    model = Recognizer3D(TimeSformerConfig(**TS_KW), num_classes=5)
    videos = jnp.asarray(rng.standard_normal((8, 4, 16, 16, 3)),
                         jnp.float32)
    variables = model.init(jax.random.key(0), videos)
    ref = np.asarray(model.apply(variables, videos))        # (8, 5)
    mesh = _stage_mesh(4)                                   # 1 block/stage
    with mesh:
        out = np.asarray(pipelined_cls_forward(model, variables, videos,
                                               mesh, n_microbatches=4))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.full    # full lane: layout variant; matches_single_chip keeps pp parity default
def test_pipelined_tower_multiple_blocks_per_stage():
    model = Recognizer3D(TimeSformerConfig(**TS_KW), num_classes=5)
    videos = jnp.asarray(rng.standard_normal((4, 4, 16, 16, 3)),
                         jnp.float32)
    variables = model.init(jax.random.key(1), videos)
    ref = np.asarray(model.apply(variables, videos))
    mesh = _stage_mesh(2)                                   # 2 blocks/stage
    with mesh:
        out = np.asarray(pipelined_cls_forward(model, variables, videos,
                                               mesh, n_microbatches=2))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.full    # full lane: pp grad correctness; the driver dryrun differentiates the same pipelined loss every round
def test_pipelined_loss_differentiates():
    # 2 layers over 2 stages: smallest program that still sends
    # gradients through a ppermute hop (1-cpu box: keep compiles lean)
    kw = dict(TS_KW, num_layers=2)
    model = Recognizer3D(TimeSformerConfig(**kw), num_classes=5)
    videos = jnp.asarray(rng.standard_normal((4, 4, 16, 16, 3)),
                         jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.key(2), videos)
    mesh = _stage_mesh(2)

    def loss(params):
        return pipelined_cls_loss(model, {"params": params}, videos,
                                  labels, mesh, n_microbatches=2)

    with mesh:
        val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # every block's params receive gradient through the pipeline
    for i in range(2):
        g = grads["backbone"][f"block_{i}"]
        assert max(float(np.abs(np.asarray(x)).max())
                   for x in jax.tree.leaves(g)) > 0


def _expert_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("expert",))


@pytest.mark.full    # full lane: MoE train loop; the dryrun trains a MoE step every round and test_moe_expert_parallel covers dispatch
def test_moe_classifier_trains_and_balances():
    mesh = _expert_mesh(4)
    cfg = MoEVideoConfig(num_classes=2, width=16, num_heads=2,
                         num_layers=2, n_experts=4, expert_hidden=32,
                         moe_every=2)
    model = MoEVideoClassifier(cfg, mesh)
    B, T, F = 8, 4, 12
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    y = (x.mean(axis=(1, 2)) > 0).astype(np.int64)
    x = jnp.asarray(x + y[:, None, None] * 2.0)             # separable
    y = jnp.asarray(y)
    with mesh:
        variables = model.init(jax.random.key(0), x)
        tx = optax.adamw(3e-3)
        params = variables["params"]
        opt_state = tx.init(params)
        step = make_moe_train_step(model, tx)
        losses = []
        for _ in range(12):
            params, opt_state, logs = step(params, opt_state, x, y)
            losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.75, losses[:3] + losses[-3:]
    assert float(logs["dropped_fraction"]) <= 0.5
    assert float(logs["load_balance_loss"]) > 0


@pytest.mark.full    # full lane: sharding probe; test_moe_expert_parallel + the dryrun MoE stage stay default
def test_moe_param_shardings_shard_expert_axis():
    mesh = _expert_mesh(4)
    cfg = MoEVideoConfig(num_classes=2, width=16, num_heads=2,
                         num_layers=2, n_experts=4, expert_hidden=32)
    model = MoEVideoClassifier(cfg, mesh)
    x = jnp.zeros((4, 2, 8), jnp.float32)
    with mesh:
        params = model.init(jax.random.key(0), x)["params"]
    sh = moe_param_shardings(params, mesh)
    w1 = jax.device_put(params["moe_w1_1"], sh["moe_w1_1"])
    # 4 experts over 4 devices -> each shard holds exactly one expert
    assert w1.sharding.shard_shape(w1.shape)[0] == 1
    dense = jax.device_put(params["input_proj"]["kernel"],
                           sh["input_proj"]["kernel"])
    assert dense.sharding.shard_shape(dense.shape) == dense.shape
