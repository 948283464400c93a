"""Recognition/caption training steps learn on synthetic data."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.models.decoder_head import RNNDecoderConfig
from cross_modal_video_engine_tpu.models.recognizer import (
    Recognizer3D, Recognizer3DRelseq)
from cross_modal_video_engine_tpu.train.recognition_trainer import (
    RecognitionTrainConfig, RecTrainState, evaluate_classification,
    make_cls_train_step, make_rec_optimizer, make_seq_train_step)

rng = np.random.default_rng(23)
TS = TimeSformerConfig(num_frames=2, img_size=16, patch_size=8,
                       embed_dims=16, num_heads=2, num_layers=1,
                       drop_path_max=0.0)


def _videos(labels):
    """Video whose mean brightness encodes the class."""
    B = len(labels)
    v = rng.standard_normal((B, 2, 16, 16, 3)).astype(np.float32) * 0.1
    for i, l in enumerate(labels):
        v[i] += (l * 2 - 1) * 0.8
    return jnp.asarray(v)


@pytest.mark.full    # full lane: step-level; the recognition CLI e2e trains and evals the same loop default
def test_classification_learns():
    model = Recognizer3D(TS, num_classes=2)
    labels = np.array([0, 1] * 4)
    videos = _videos(labels)
    lab = jnp.asarray(labels)
    cfg = RecognitionTrainConfig(optimizer="adamw", learning_rate=3e-3,
                                 grad_clip=1.0)
    tx = make_rec_optimizer(cfg)
    variables = model.init(jax.random.key(0), videos)
    state = RecTrainState(variables["params"], tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    step = make_cls_train_step(model, tx)
    k = jax.random.key(1)
    accs = []
    for i in range(30):
        k, sub = jax.random.split(k)
        state, logs = step(state, videos, lab, sub)
        accs.append(float(logs["top1_acc"]))
    assert accs[-1] >= 0.9, accs[-5:]

    report = evaluate_classification(
        model, state.params, [(videos, lab, len(labels))])
    assert report["top1_acc"] >= 0.9
    assert 0 <= report["mean_class_accuracy"] <= 1


@pytest.mark.full    # full lane: step-level caption training; the caption
# train CLI e2e (test_caption_train_cli, 3 recipes) stays default
def test_caption_seq_training_reduces_loss():
    dcfg = RNNDecoderConfig(num_classes=5, in_channels=TS.embed_dims,
                            max_len=3, input_dropout_p=0.0)
    model = Recognizer3DRelseq(TS, dcfg)
    videos = _videos([0, 1, 0, 1])
    tgt = jnp.asarray((rng.random((4, 3, 5)) > 0.5).astype(np.float32))
    mask = jnp.ones((4, 3), jnp.float32)
    # note: like the reference, the MLL loss sees sigmoid PROBS (bounded
    # [0,1]) rather than raw logits, so per-step movement is small
    cfg = RecognitionTrainConfig(optimizer="adamw", learning_rate=1e-2,
                                 grad_clip=1.0)
    tx = make_rec_optimizer(cfg)
    variables = model.init(jax.random.key(0), videos, tgt, mode="train")
    state = RecTrainState(variables["params"], tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    step = make_seq_train_step(model, tx)
    k = jax.random.key(1)
    losses = []
    for i in range(80):
        k, sub = jax.random.split(k)
        state, logs = step(state, videos, tgt, mask, sub)
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
    assert losses[-1] == min(losses) or losses[-1] < losses[0]
