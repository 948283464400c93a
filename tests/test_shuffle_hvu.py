"""Shuffle-contrast recognizers + HVU loss."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp
import optax

from cross_modal_video_engine_tpu.losses.hvu import hvu_loss
from cross_modal_video_engine_tpu.losses.shuffle import (
    cosine_away_loss, soft_cross_entropy, soft_label_smooth)
from cross_modal_video_engine_tpu.models.recognizer import (
    Recognizer3DShuffleEmb, Recognizer3DShuffleExtra, Recognizer3DShuffleSoft)
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
import pytest

rng = np.random.default_rng(419)

TS = TimeSformerConfig(num_frames=4, img_size=16, patch_size=8,
                       embed_dims=16, num_heads=2, num_layers=1,
                       drop_path_max=0.0)


def test_cosine_away_matches_torch():
    x = rng.standard_normal((5, 8)).astype(np.float32)
    y = rng.standard_normal((5, 8)).astype(np.float32)
    got = float(cosine_away_loss(jnp.asarray(x), jnp.asarray(y), 0.3))
    want = tF.cosine_embedding_loss(
        torch.from_numpy(x), torch.from_numpy(y),
        torch.full((5,), -1.0), margin=0.3).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_soft_label_and_ce():
    labels = jnp.asarray([1, 3])
    soft = soft_label_smooth(labels, 4, margin=0.5)
    np.testing.assert_allclose(np.asarray(soft[0]),
                               [0.125, 0.5, 0.125, 0.125])
    scores = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    got = float(soft_cross_entropy(scores, soft))
    lsm = np.asarray(jax.nn.log_softmax(scores, -1))
    want = float(np.mean(-(np.asarray(soft) * lsm).sum(-1)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _train(model, init_args, step_args, steps=15):
    variables = model.init(jax.random.key(0), *init_args,
                           method="forward_train")
    tx = optax.adam(3e-3)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, *step_args,
                              method="forward_train")
            return out["loss"], out
        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, out

    hist = []
    for _ in range(steps):
        params, opt_state, out = step(params, opt_state)
        hist.append({k: float(v) for k, v in out.items()})
    return hist


@pytest.mark.full    # full lane: 3-recognizer train loop; shuffle losses + api shuffle_idx stay default
def test_shuffle_recognizers_train():
    videos = jnp.asarray(rng.standard_normal((4, 4, 16, 16, 3)), jnp.float32)
    shuffled = videos[:, ::-1]
    labels = jnp.asarray([0, 1, 2, 0], jnp.int32)

    emb = Recognizer3DShuffleEmb(TS, num_classes=3)
    hist = _train(emb, (videos, shuffled, labels),
                  (videos, shuffled, labels))
    assert {"loss_cls", "loss_cos", "loss"} <= set(hist[0])
    assert hist[-1]["loss"] < hist[0]["loss"]

    soft = Recognizer3DShuffleSoft(TS, num_classes=3)
    hist = _train(soft, (videos, shuffled, labels),
                  (videos, shuffled, labels))
    assert "loss_soft" in hist[0]
    assert hist[-1]["loss"] < hist[0]["loss"]

    extra = Recognizer3DShuffleExtra(TS, num_classes=4)   # 3 real + 1 extra
    hist = _train(extra, (videos, shuffled, labels),
                  (videos, shuffled, labels))
    assert hist[-1]["loss"] < hist[0]["loss"]
    # inference path returns real+extra scores
    variables = extra.init(jax.random.key(0), videos, shuffled, labels,
                           method="forward_train")
    scores = extra.apply(variables, videos)
    assert scores.shape == (4, 4)


def _hvu_torch_all(score, label, mask, with_mask):
    s, l = torch.from_numpy(score), torch.from_numpy(label)
    loss = tF.binary_cross_entropy_with_logits(s, l, reduction="none")
    if with_mask:
        m = torch.from_numpy(mask)
        w = (m * loss).sum(1) / m.sum(1)
        return w.mean().item()
    return loss.mean().item()


def test_hvu_loss_all_matches_torch():
    cats = ("action", "object")
    nums = (3, 4)
    score = rng.standard_normal((4, 7)).astype(np.float32)
    label = (rng.random((4, 7)) > 0.6).astype(np.float32)
    mask = np.ones((4, 7), np.float32)
    mask[0, 3:] = 0       # object tags unlabeled for sample 0
    for with_mask in (False, True):
        got = hvu_loss(jnp.asarray(score), jnp.asarray(label),
                       mask=jnp.asarray(mask), categories=cats,
                       category_nums=nums, with_mask=with_mask)
        want = _hvu_torch_all(score, label, mask, with_mask)
        np.testing.assert_allclose(float(got["loss_cls"]), want, rtol=1e-5)


def test_hvu_loss_individual():
    cats = ("action", "object")
    nums = (3, 4)
    score = rng.standard_normal((4, 7)).astype(np.float32)
    label = (rng.random((4, 7)) > 0.6).astype(np.float32)
    category_mask = np.ones((4, 2), np.float32)
    category_mask[:, 1] = 0        # nobody labels objects
    out = hvu_loss(jnp.asarray(score), jnp.asarray(label),
                   category_mask=jnp.asarray(category_mask),
                   categories=cats, category_nums=nums,
                   loss_type="individual", with_mask=True)
    assert {"action_LOSS", "object_LOSS", "loss_cls"} <= set(out)
    # unlabeled category contributes zero loss and zero weight
    np.testing.assert_allclose(float(out["object_LOSS"]), 0.0)
    np.testing.assert_allclose(float(out["object_LOSS_weight"]), 0.0)
    np.testing.assert_allclose(float(out["action_LOSS_weight"]), 1.0)
    np.testing.assert_allclose(float(out["loss_cls"]),
                               float(out["action_LOSS"]), rtol=1e-6)
    # torch replica for the labeled category
    s = torch.from_numpy(score[:, :3])
    l = torch.from_numpy(label[:, :3])
    want = tF.binary_cross_entropy_with_logits(
        s, l, reduction="none").mean(1).mean().item()
    np.testing.assert_allclose(float(out["action_LOSS"]), want, rtol=1e-5)
