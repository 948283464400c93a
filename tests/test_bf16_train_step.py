"""bf16 mixed-precision train step (the Fp16OptimizerHook analogue):
loss decreases, master params stay f32, batch_stats stay f32."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from cross_modal_video_engine_tpu.train.recognition_trainer import (
    RecognitionTrainConfig, RecTrainState, make_cls_train_step,
    make_cls_train_step_stats, make_rec_optimizer)

rng = np.random.default_rng(23)


class _TinyBackbone(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, name="bn")(
            nn.Dense(16, name="fc")(x)))
        return x.mean(axis=1)


class _TinyClassifier(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return nn.Dense(2, name="head")(_TinyBackbone(name="bb")(
            x, train=train))


def test_bf16_step_trains_and_keeps_f32_master():
    model = _TinyClassifier()
    x = rng.standard_normal((16, 4, 8)).astype(np.float32)
    y = (x.mean(axis=(1, 2)) > 0).astype(np.int64)
    x = jnp.asarray(x + y[:, None, None])
    y = jnp.asarray(y)
    variables = model.init(jax.random.key(0), x)
    tx = make_rec_optimizer(RecognitionTrainConfig(
        optimizer="adamw", learning_rate=3e-2, grad_clip=1.0, bf16=True))
    state = RecTrainState(variables["params"],
                          tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    stats = variables["batch_stats"]
    step = make_cls_train_step_stats(model, tx, bf16=True)
    losses = []
    key = jax.random.key(1)
    for _ in range(25):
        key, sub = jax.random.split(key)
        state, stats, logs = step(state, stats, x, y, sub)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses
    # master params and running stats stay f32 across steps
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.params))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(stats))


def test_bf16_step_statless_variant():
    class _NoBN(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            return nn.Dense(2, name="head")(x.mean(axis=1))

    model = _NoBN()
    x = jnp.asarray(rng.standard_normal((8, 4, 8)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (8,)), jnp.int32)
    variables = model.init(jax.random.key(0), x)
    tx = make_rec_optimizer(RecognitionTrainConfig(
        optimizer="adamw", learning_rate=1e-2, bf16=True))
    state = RecTrainState(variables["params"],
                          tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    step = make_cls_train_step(model, tx, bf16=True)
    state, logs = step(state, x, y, jax.random.key(1))
    assert np.isfinite(float(logs["loss"]))
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.params))
