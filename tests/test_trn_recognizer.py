"""TRN head as the consensus of a 2D recognizer (its reference role:
TSM/TSN backbone features -> multi-scale temporal relations)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cross_modal_video_engine_tpu.models import TRNHead, TSMConfig, TSMResNet
from cross_modal_video_engine_tpu.models.recognizer import Recognizer2D

rng = np.random.default_rng(653)


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
