"""Transformer caption decoder: KV-cache consistency, greedy, beam."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cross_modal_video_engine_tpu.models.caption_transformer import (
    CaptionConfig, CaptionTransformer)

rng = np.random.default_rng(291)

CFG = CaptionConfig(vocab_size=40, d_model=32, heads=4, layers=2,
                    max_len=6, enc_dim=16, bos_id=1, eos_id=2)


@pytest.fixture(scope="module")
def setup():
    model = CaptionTransformer(CFG)
    enc = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 40, (2, 6)), jnp.int32)
    variables = model.init(jax.random.key(0), enc, ids, mode="train")
    return model, variables, enc, ids


def test_train_logits_shape_and_causality(setup):
    model, variables, enc, ids = setup
    logits = model.apply(variables, enc, ids, mode="train")
    assert logits.shape == (2, 6, 40)
    # causality: changing a later token must not affect earlier logits
    ids2 = ids.at[:, 4].set(7)
    logits2 = model.apply(variables, enc, ids2, mode="train")
    np.testing.assert_allclose(np.asarray(logits[:, :4]),
                               np.asarray(logits2[:, :4]), atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, 5]), np.asarray(logits2[:, 5]))


def test_greedy_matches_teacher_forced_rescoring(setup):
    """KV-cache decode must equal the full (non-cached) forward: feeding
    the greedy output back through train mode reproduces its own argmax
    chain."""
    model, variables, enc, _ = setup
    out_ids, scores = model.apply(variables, enc, None, mode="greedy")
    assert out_ids.shape == (2, CFG.max_len)

    # teacher-forced rescoring of the greedy sequence
    shifted = jnp.concatenate(
        [jnp.full((2, 1), CFG.bos_id, jnp.int32), out_ids[:, :-1]], axis=1)
    logits = model.apply(variables, enc, shifted, mode="train")
    greedy_from_full = np.asarray(jnp.argmax(logits, -1))
    got = np.asarray(out_ids)
    # wherever the sequence hasn't finished, cached argmax == full argmax
    for b in range(2):
        for t in range(CFG.max_len):
            np.testing.assert_array_equal(got[b, t], greedy_from_full[b, t])
            if got[b, t] == CFG.eos_id:
                break


def test_beam_never_worse_than_greedy(setup):
    model, variables, enc, _ = setup
    _, greedy_scores = model.apply(variables, enc, None, mode="greedy")
    _, beam_scores = model.apply(variables, enc, None, mode="beam",
                                 beam_width=4)
    assert np.all(np.asarray(beam_scores) >= np.asarray(greedy_scores) - 1e-4)


def test_beam_score_is_true_logprob(setup):
    """The winning beam's score equals the sum of per-step log-probs of
    its tokens under teacher forcing."""
    model, variables, enc, _ = setup
    ids, scores = model.apply(variables, enc, None, mode="beam",
                              beam_width=3)
    shifted = jnp.concatenate(
        [jnp.full((2, 1), CFG.bos_id, jnp.int32), ids[:, :-1]], axis=1)
    logits = model.apply(variables, enc, shifted, mode="train")
    logp = jax.nn.log_softmax(logits, -1)
    for b in range(2):
        total = 0.0
        for t in range(CFG.max_len):
            total += float(logp[b, t, ids[b, t]])
            if int(ids[b, t]) == CFG.eos_id:
                break
        # after EOS the decode only appends EOS at logp cost 0
        np.testing.assert_allclose(float(scores[b]), total, rtol=1e-3,
                                   atol=1e-3)


def test_caption_transformer_trains():
    model = CaptionTransformer(CFG)
    enc = jnp.asarray(rng.standard_normal((4, 5, 16)), jnp.float32)
    # target: constant sequence per sample
    tgt = jnp.asarray(np.tile(np.array([[5, 6, 7, 2, 2, 2]]), (4, 1)),
                      jnp.int32)
    inp = jnp.concatenate([jnp.full((4, 1), CFG.bos_id, jnp.int32),
                           tgt[:, :-1]], 1)
    variables = model.init(jax.random.key(0), enc, inp, mode="train")
    tx = optax.adam(5e-3)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt):
        def loss_fn(params):
            logits = model.apply({"params": params}, enc, inp, mode="train")
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, tgt).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    params = variables["params"]
    for i in range(60):
        params, opt, loss = step(params, opt)
    out_ids, _ = model.apply({"params": params}, enc, None, mode="greedy")
    np.testing.assert_array_equal(np.asarray(out_ids)[:, :4],
                                  np.asarray(tgt)[:, :4])
