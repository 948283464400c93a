"""AGCN (adaptive graph conv) skeleton backbone."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from cross_modal_video_engine_tpu.models import AGCN, AGCNConfig

rng = np.random.default_rng(507)


@pytest.mark.full    # full lane: shape probe; test_agcn_trains + the skeleton CLI e2e
# cover AGCN
def test_agcn_shapes_and_adaptivity():
    cfg = AGCNConfig(channels=(8, 16), temporal_strides=(1, 2))
    model = AGCN(cfg)
    kp = jnp.asarray(rng.standard_normal((2, 8, 17, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), kp)
    out = model.apply(variables, kp)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()
    # learned adjacency offsets exist per block, ~zero at init
    pa = variables["params"]["block_0"]["PA"]
    assert pa.shape == (3, 17, 17)
    np.testing.assert_allclose(np.asarray(pa), 1e-6)
    # the attention adjacency is DATA-dependent: permuting joints of one
    # sample changes its feature (a fixed-adjacency STGCN layer with
    # symmetric inputs would too, so perturb a single joint instead)
    kp2 = kp.at[0, :, 5].add(2.0)
    out2 = model.apply(variables, kp2)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out2[0]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]),
                               rtol=1e-5)


@pytest.mark.full    # full lane: step-level; the skeleton CLI e2e (test_skeleton_train_cli agcn_joint_and_bone) trains AGCN default
def test_agcn_trains():
    cfg = AGCNConfig(channels=(8, 8), temporal_strides=(1, 1))
    model = AGCN(cfg)
    from cross_modal_video_engine_tpu.models.recognizer import (
        BackboneClassifier)
    clf = BackboneClassifier(model, num_classes=2)
    # class = whether joint 0 leads or trails joint 1 in x
    labels = np.arange(8) % 2
    kp = rng.standard_normal((8, 8, 17, 3)).astype(np.float32) * 0.1
    kp[:, :, 0, 0] += np.where(labels == 0, -1.0, 1.0)[:, None]
    kp, labels = jnp.asarray(kp), jnp.asarray(labels, jnp.int32)

    variables = clf.init(jax.random.key(0), kp)
    tx = optax.adam(5e-3)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p, s):
            scores, newv = clf.apply(
                {"params": p, "batch_stats": s}, kp, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)})
            loss = optax.softmax_cross_entropy_with_integer_labels(
                scores, labels).mean()
            return loss, newv["batch_stats"]
        (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), stats2, opt_state, loss

    hist = []
    for _ in range(25):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        hist.append(float(loss))
    assert hist[-1] < hist[0] * 0.7, hist[::8]
