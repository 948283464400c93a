"""TRN head as the consensus of a 2D recognizer (its reference role:
TSM/TSN backbone features -> multi-scale temporal relations)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cross_modal_video_engine_tpu.models import TRNHead, TSMConfig, TSMResNet
from cross_modal_video_engine_tpu.models.recognizer import Recognizer2D

rng = np.random.default_rng(653)


def test_trainer_feeds_relation_rng():
    """The shared train steps must pass the 'relation' rng stream so
    TRNMultiScale subsamples different tuples per step (regression:
    dropout-only rngs silently pinned the eval fallback tuples)."""
    from cross_modal_video_engine_tpu.models.heads import TRNHead
    from cross_modal_video_engine_tpu.train.recognition_trainer import (
        make_cls_train_step_stats)

    T = 6
    backbone = TSMResNet(TSMConfig(stage_blocks=(1,), base_channels=8))
    head = TRNHead(num_classes=3, num_segments=T, hidden_dim=8,
                   bottleneck_dim=8, dropout_ratio=0.0, max_subsample=1)
    model = Recognizer2D(backbone, head)
    clips = jnp.asarray(rng.standard_normal((2, T, 16, 16, 3)),
                        jnp.float32)
    labels = jnp.zeros((2,), jnp.int32)
    variables = model.init(jax.random.key(0), clips)

    step = make_cls_train_step_stats(model, optax.sgd(0.0))
    from cross_modal_video_engine_tpu.train.recognition_trainer import (
        RecTrainState)
    state = RecTrainState(variables["params"],
                          optax.sgd(0.0).init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    losses = set()
    for i in range(6):
        _, _, logs = step(state, variables["batch_stats"], clips, labels,
                          jax.random.key(i))
        losses.add(round(float(logs["loss"]), 8))
    # with max_subsample=1 and lr=0 the only step-to-step variation is
    # the relation tuple draw — several distinct losses proves the
    # stream reaches the head
    assert len(losses) > 1


def test_recognizer2d_with_trn_head_trains():
    T = 4
    backbone = TSMResNet(TSMConfig(stage_blocks=(1, 1), base_channels=8))
    head = TRNHead(num_classes=2, num_segments=T, hidden_dim=16,
                   bottleneck_dim=8, dropout_ratio=0.0)
    model = Recognizer2D(backbone, head)

    # class = temporal direction of a brightness ramp (needs relations,
    # a mean-consensus can't separate these)
    n = 8
    labels = np.arange(n) % 2
    ramp = np.linspace(-1, 1, T)[None, :, None, None, None]
    clips = np.where(labels[:, None, None, None, None] == 0, ramp, -ramp)
    clips = (clips + 0.05 * rng.standard_normal((n, T, 16, 16, 3))
             ).astype(np.float32)
    clips, labels = jnp.asarray(clips), jnp.asarray(labels, jnp.int32)

    variables = model.init(jax.random.key(0), clips)
    scores = model.apply(variables, clips)
    assert scores.shape == (n, 2)

    tx = optax.adam(5e-3)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, key):
        def loss_fn(p, s):
            out, newv = model.apply(
                {"params": p, "batch_stats": s}, clips, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": key, "relation": key})
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out, labels).mean()
            acc = (out.argmax(-1) == labels).mean()
            return loss, (newv["batch_stats"], acc)
        (loss, (stats2, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), stats2, opt_state,
                loss, acc)

    hist = []
    for i in range(40):
        params, stats, opt_state, loss, acc = step(
            params, stats, opt_state, jax.random.key(i))
        hist.append((float(loss), float(acc)))
    assert hist[-1][0] < hist[0][0] * 0.6, hist[::10]
    assert hist[-1][1] >= 0.9
