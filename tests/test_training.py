"""Training-loop tests: losses go down, schedules fire, combiner learns."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fixtures import make_collection, tiny_config

from cross_modal_video_engine_tpu.cli.common import load_dataset
from cross_modal_video_engine_tpu.cli.retrieval_trainer import train
from cross_modal_video_engine_tpu.models.combiner import Combiner, CombinerConfig
from cross_modal_video_engine_tpu.models.dual_encoding import DualEncoding
from cross_modal_video_engine_tpu.train.linas_trainer import (
    EpochScheduler, LinasTrainConfig, get_learning_rate, init_train_state,
    make_optimizer, make_train_step, set_learning_rate, TrainState)
from cross_modal_video_engine_tpu.train.combiner_trainer import (
    CombinerTrainConfig, composed_rank_eval, init_combiner_state,
    make_combiner_optimizer, make_combiner_train_step)

rng = np.random.default_rng(17)


def test_linas_train_step_reduces_loss(tmp_path):
    info = make_collection(str(tmp_path), n_videos=8, caps_per_video=3)
    ds = load_dataset(str(tmp_path), info["collection"], info["feature"],
                      support_set_number=2)
    cfg = tiny_config(info)
    tcfg = LinasTrainConfig(learning_rate=5e-3, cost_style="mean",
                            distill_with_triplet=True)
    model = DualEncoding(cfg)
    tx = make_optimizer(tcfg)
    videos, text, support, _ = next(ds.train_batches(8, 0))
    state = init_train_state(model, tx, videos, text, support)
    step = make_train_step(model, tcfg, tx)
    k = jax.random.key(0)
    first = None
    for i in range(12):
        k, sub = jax.random.split(k)
        state, logs = step(state, videos, text, support, sub)
        if first is None:
            first = float(logs["loss"])
    assert float(logs["loss"]) < first, (first, float(logs["loss"]))
    assert np.isfinite(float(logs["distill"]))


def test_epoch_scheduler_semantics():
    tcfg = LinasTrainConfig(learning_rate=1.0, lr_decay_rate=0.99)
    model_cfg_sched = EpochScheduler(tcfg)
    # fake state holding only opt hyperparams
    tx = make_optimizer(tcfg)
    params = {"w": jnp.ones(3)}
    state = TrainState(params, {}, tx.init(params))
    # improving epoch: just *0.99
    state, best, stop = model_cfg_sched.on_epoch_end(state, 10.0)
    assert best and not stop
    np.testing.assert_allclose(get_learning_rate(state), 0.99, rtol=1e-6)
    # 3 non-improving epochs -> halve on the 3rd
    for i in range(3):
        state, best, stop = model_cfg_sched.on_epoch_end(state, 5.0)
        assert not best
    lr = get_learning_rate(state)
    np.testing.assert_allclose(lr, 0.99 * 0.99**3 * 0.5, rtol=1e-5)
    # 6 total non-improving -> stop
    for i in range(3):
        state, best, stop = model_cfg_sched.on_epoch_end(state, 5.0)
    assert stop


def test_full_train_loop_tiny(tmp_path):
    """2-epoch end-to-end train() on the tiny fixture: writes history,
    best checkpoint, val_metric_hist.txt."""
    import os
    info = make_collection(str(tmp_path), n_videos=6, caps_per_video=3)
    ds = load_dataset(str(tmp_path), info["collection"], info["feature"],
                      support_set_number=2)
    cfg = tiny_config(info)
    tcfg = LinasTrainConfig(learning_rate=1e-3, cost_style="mean")
    out = str(tmp_path / "run")
    os.makedirs(out, exist_ok=True)
    state, history, best = train(cfg, tcfg, ds, ds, out, batch_size=6,
                                 num_epochs=2, log_every=0)
    assert len(history) == 2
    assert os.path.exists(os.path.join(out, "val_metric_hist.txt"))
    assert os.path.exists(best)


@pytest.mark.full    # full lane: duplicate combiner training; the combiner
# trainer CLI e2e (test_caption_explain_cli) stays default
def test_combiner_training_learns():
    """Synthetic composed retrieval: target = ref + text-direction shift.
    After training, recall@1 with reference masking must beat chance."""
    D, B, F, L = 16, 16, 2, 4
    ccfg = CombinerConfig(clip_feature_dim=D, projection_dim=16,
                          hidden_dim=32, n_heads=2)
    model = Combiner(ccfg)
    n = 32
    base = rng.standard_normal((n, D)).astype(np.float32)
    text_dir = rng.standard_normal((n, D)).astype(np.float32)
    target = (base + text_dir).astype(np.float32)

    def feats(x):
        high = jnp.asarray(np.repeat(x[:, None, :], F, 1))
        middle = jnp.asarray(
            np.repeat(np.repeat(x[:, None, :], F, 1)[:, :, None, :], L, 2))
        return high, middle

    ref_feats = feats(base)
    tgt_feats = feats(target)
    text_feats = jnp.asarray(text_dir)

    tcfg = CombinerTrainConfig(learning_rate=3e-3)
    tx = make_combiner_optimizer(tcfg)
    state = init_combiner_state(model, tx, ref_feats, text_feats, tgt_feats)
    step = make_combiner_train_step(model, tx)
    k = jax.random.key(0)
    losses = []
    for i in range(60):
        k, sub = jax.random.split(k)
        state, loss = step(state, ref_feats, text_feats, tgt_feats, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # eval with reference masking: index = refs + targets stacked
    index_high = jnp.concatenate([ref_feats[0], tgt_feats[0]], axis=0)
    reference_rows = jnp.arange(n)           # refs occupy rows 0..n-1
    gt_rows = jnp.arange(n) + n              # targets at rows n..2n-1
    order, metrics = composed_rank_eval(
        model, state.params, ref_feats, text_feats, index_high,
        reference_rows, gt_rows)
    assert metrics["recall_at1"] > 50.0, metrics
    # masked reference must never be ranked first
    assert not np.any(order[:, 0] == np.asarray(reference_rows))


@pytest.mark.full    # full lane: trainer-level resume; every CLI has its own resume e2e
# (recognition/audio/caption/detection restore state + batch_stats)
def test_resume_training(tmp_path):
    """Interrupt-and-resume: resumed run continues from the saved epoch
    with optimizer state and scheduler memory intact."""
    import os
    from cross_modal_video_engine_tpu.train.resume import latest_checkpoint
    info = make_collection(str(tmp_path), n_videos=6, caps_per_video=3)
    ds = load_dataset(str(tmp_path), info["collection"], info["feature"],
                      support_set_number=2)
    cfg = tiny_config(info)
    tcfg = LinasTrainConfig(learning_rate=1e-3, cost_style="mean")
    out = str(tmp_path / "run")
    os.makedirs(out, exist_ok=True)
    from cross_modal_video_engine_tpu.cli.retrieval_trainer import train
    state, hist1, _ = train(cfg, tcfg, ds, ds, out, batch_size=6,
                            num_epochs=2, log_every=0,
                            checkpoint_interval=1)
    ck = latest_checkpoint(out)
    assert ck is not None and ck.endswith("epoch_1")
    state2, hist2, _ = train(cfg, tcfg, ds, ds, out, batch_size=6,
                             num_epochs=4, log_every=0, resume=ck)
    # resumed run starts at epoch 2
    assert [h["epoch"] for h in hist2] == [2, 3]
    # learning rate continued decaying from the restored optimizer state
    assert hist2[0]["lr"] < 1e-3 * 0.99


@pytest.mark.full    # full lane: mesh dp training; the multichip dryrun runs a sharded
# dp+tp train step every round
def test_mesh_data_parallel_training():
    """Batch sharded over the 8-device 'data' axis: step runs, loss is
    replicated and finite, params update identically to single-device."""
    from cross_modal_video_engine_tpu.parallel.mesh import make_mesh
    from cross_modal_video_engine_tpu.models.dual_encoding import (
        DualEncodingConfig, make_video_batch, make_text_batch)
    cfg = DualEncodingConfig(
        visual_feat_dim=12, visual_rnn_size=4, visual_kernel_num=2,
        visual_kernel_sizes=(2,), vocab_size=20, bow_vocab_size=10,
        word_dim=6, text_rnn_size=4, text_kernel_num=2,
        text_kernel_sizes=(2,), hidden_size=8, common_dim=8)
    tcfg = LinasTrainConfig(learning_rate=1e-3, cost_style="mean")
    model = DualEncoding(cfg)
    tx = make_optimizer(tcfg)
    B = 16  # divisible by 8 devices
    feats = [rng.standard_normal((5, 12)).astype(np.float32)
             for _ in range(B)]
    videos = make_video_batch(feats, 8)
    ids = [[1, 4, 2]] * B
    text = make_text_batch(ids, rng.random((B, 10)).astype(np.float32), 6)
    from cross_modal_video_engine_tpu.models.dual_encoding import TextBatch
    support = TextBatch(
        ids=jnp.ones((B, 2, 6), jnp.int32),
        bows=jnp.zeros((B, 2, 10), jnp.float32),
        lengths=jnp.full((B, 2), 3, jnp.int32),
        mask=jnp.ones((B, 2, 6), jnp.float32))

    state = init_train_state(model, tx, videos, text, support)
    mesh = make_mesh()
    step_sharded = make_train_step(model, tcfg, tx, mesh=mesh)
    step_single = make_train_step(model, tcfg, tx)
    k = jax.random.key(0)
    s1, logs1 = step_sharded(state, videos, text, support, k)
    s2, logs2 = step_single(state, videos, text, support, k)
    np.testing.assert_allclose(float(logs1["loss"]), float(logs2["loss"]),
                               rtol=1e-4)
    # parameter updates agree between sharded and single-device execution.
    # Adam turns near-zero gradients whose SIGN depends on float reduction
    # order into +-lr steps, so bound the divergence by 2*lr instead of
    # demanding bitwise-equal params (a structural sharding bug would give
    # O(1) differences).
    lr = 1e-3
    n_big = 0
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert diff.max() <= 2.1 * lr, diff.max()
        n_big += int((diff > 0.5 * lr).sum())
    total = sum(np.asarray(x).size for x in jax.tree.leaves(s1.params))
    assert n_big / total < 0.05, f"{n_big}/{total} params diverged"
