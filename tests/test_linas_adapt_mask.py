"""LINAS 'adapt' similarity-mask training (reference model.py:584-598
optimizer2 + train_mask :896-912)."""

import numpy as np
import jax
import jax.numpy as jnp

from fixtures import make_collection, tiny_config

from cross_modal_video_engine_tpu.cli.common import load_dataset
from cross_modal_video_engine_tpu.losses.distill import (
    adaptive_similarity_loss, huber)
from cross_modal_video_engine_tpu.models.dual_encoding import DualEncoding
from cross_modal_video_engine_tpu.train.linas_trainer import (
    LinasTrainConfig, init_mask_state, init_train_state, make_mask_optimizer,
    make_mask_train_step, make_optimizer, make_train_step, mask_matrix)

rng = np.random.default_rng(83)


def test_mask_matrix_and_adaptive_loss_formula():
    pa = jnp.asarray([2.0, -1.0])
    m = mask_matrix(pa, 3)
    np.testing.assert_allclose(np.asarray(m),
                               [[2, -1, -1], [-1, 2, -1], [-1, -1, 2]])

    B, D = 4, 6
    v = rng.standard_normal((B, D)).astype(np.float32)
    c = rng.standard_normal((B, D)).astype(np.float32)
    sv = rng.standard_normal((B, D)).astype(np.float32)
    sc = rng.standard_normal((B, D)).astype(np.float32)
    mask = np.asarray(mask_matrix(jnp.asarray([1.0, 1.0]), B))
    got = float(adaptive_similarity_loss(
        jnp.asarray(v), jnp.asarray(c), jnp.asarray(sv), jnp.asarray(sc),
        jnp.asarray(mask)))
    # independent numpy replica of model.py:835-843
    s1, s2 = v @ c.T, sv @ sc.T
    w = np.exp(mask - mask.max(0)) / np.exp(mask - mask.max(0)).sum(0)
    rw = 1.0 / (np.abs(s1) + 1e-6)
    d = np.abs(s1 - s2)
    hub = np.where(d < 1, 0.5 * d * d, d - 0.5)
    want = (rw * w * hub).sum() * B
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mask_step_trains_only_the_mask(tmp_path):
    info = make_collection(str(tmp_path), n_videos=8, caps_per_video=2)
    ds = load_dataset(str(tmp_path), info["collection"], info["feature"],
                      support_set_number=2)
    cfg = tiny_config(info, student_model="text+video")
    tcfg = LinasTrainConfig(learning_rate=1e-3, cost_style="mean",
                            distill_with_similarity=True,
                            similarity_type="adapt")
    model = DualEncoding(cfg)
    tx = make_optimizer(tcfg)
    videos, text, support, _ = next(ds.train_batches(8, 0))
    state = init_train_state(model, tx, videos, text, support)

    tx2 = make_mask_optimizer(tcfg)
    mask_state = init_mask_state(tx2)
    mask_step = make_mask_train_step(model, tx2)

    params_before = jax.tree.leaves(state.params)
    pa0 = np.asarray(mask_state.pa)
    losses = []
    for _ in range(8):
        mask_state, loss = mask_step(mask_state, state, videos, text,
                                     support)
        losses.append(loss)
    # the mask moved, the model params did not
    assert not np.allclose(np.asarray(mask_state.pa), pa0)
    for a, b in zip(jax.tree.leaves(state.params), params_before):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # the main step consumes the learned mask (detached) — loss finite and
    # decreasing over a few steps
    step = make_train_step(model, tcfg, tx)
    k = jax.random.key(0)
    hist = []
    for _ in range(8):
        k, sub = jax.random.split(k)
        adapt = mask_matrix(mask_state.pa, videos.frames.shape[0])
        state, logs = step(state, videos, text, support, sub, adapt)
        hist.append(float(logs["loss"]))
        assert np.isfinite(float(logs["similarity"]))
    assert hist[-1] < hist[0]


def test_adapt_cli_path(tmp_path):
    """The trainer CLI runs end-to-end with the adapt flag on."""
    from cross_modal_video_engine_tpu.cli.retrieval_trainer import train
    info = make_collection(str(tmp_path), n_videos=8, caps_per_video=2)
    train_set = load_dataset(str(tmp_path), info["collection"],
                             info["feature"], support_set_number=2)
    val_set = load_dataset(str(tmp_path), info["collection"],
                           info["feature"])
    cfg = tiny_config(info, student_model="text+video")
    tcfg = LinasTrainConfig(learning_rate=1e-3, cost_style="mean",
                            distill_with_similarity=True,
                            similarity_type="adapt", num_epochs=2)
    out = str(tmp_path / "run")
    import os
    os.makedirs(out)
    state, history, best = train(cfg, tcfg, train_set, val_set, out,
                                 batch_size=8, log_every=0)
    assert len(history) == 2
    assert np.isfinite([h["loss"] for h in history]).all()
