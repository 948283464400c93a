"""TimeSformer backbone + caption decoder tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_modal_video_engine_tpu.models.timesformer import (
    TimeSformer, TimeSformerConfig)
from cross_modal_video_engine_tpu.models.decoder_head import (
    GRUCell, RNNDecoderConfig, RNNDecoderHead)
from cross_modal_video_engine_tpu.models.recognizer import (
    Recognizer3D, Recognizer3DRelseq, average_clip)

rng = np.random.default_rng(9)

TINY_TS = TimeSformerConfig(num_frames=4, img_size=32, patch_size=8,
                            embed_dims=24, num_heads=2, num_layers=2)


def _videos(B=2, cfg=TINY_TS):
    return jnp.asarray(rng.standard_normal(
        (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3)), jnp.float32)


@pytest.mark.parametrize("attn", ["divided_space_time", "joint_space_time",
                                  "space_only"])
def test_timesformer_variants(attn):
    cfg = TimeSformerConfig(num_frames=4, img_size=32, patch_size=8,
                            embed_dims=24, num_heads=2, num_layers=2,
                            attention_type=attn)
    model = TimeSformer(cfg)
    v = _videos(cfg=cfg)
    variables = model.init(jax.random.key(0), v)
    out = model.apply(variables, v)
    assert out.shape == (2, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_timesformer_tokens_layout():
    model = TimeSformer(TINY_TS)
    v = _videos()
    variables = model.init(jax.random.key(0), v)
    cls, tokens = model.apply(variables, v, return_tokens=True)
    P, T = TINY_TS.num_patches, TINY_TS.num_frames
    assert tokens.shape == (2, 1 + P * T, 24)
    np.testing.assert_allclose(np.asarray(tokens[:, 0]), np.asarray(cls))


def test_timesformer_zero_init_temporal_fc_matches_spatial_only_at_init():
    """temporal_fc is zero-init so at init the temporal branch is a no-op
    (reference constant_init(temporal_fc, 0), transformer.py:60-61)."""
    model = TimeSformer(TINY_TS)
    v = _videos()
    variables = model.init(jax.random.key(0), v)
    tfc = variables["params"]["block_0"]["temporal_fc"]["kernel"]
    assert np.all(np.asarray(tfc) == 0)


def test_gru_cell_torch_parity():
    import torch
    H, D = 6, 10
    cell = GRUCell(H)
    x = rng.standard_normal((3, D)).astype(np.float32)
    h = rng.standard_normal((3, H)).astype(np.float32)
    params = cell.init(jax.random.key(0), jnp.asarray(h), jnp.asarray(x))
    got = np.asarray(cell.apply(params, jnp.asarray(h), jnp.asarray(x)))

    tcell = torch.nn.GRUCell(D, H)
    p = params["params"]
    with torch.no_grad():
        tcell.weight_ih.copy_(torch.from_numpy(np.asarray(p["wi"]).T))
        tcell.bias_ih.copy_(torch.from_numpy(np.asarray(p["bi"])))
        tcell.weight_hh.copy_(torch.from_numpy(np.asarray(p["wh"]).T))
        tcell.bias_hh.copy_(torch.from_numpy(np.asarray(p["bh"])))
        want = tcell(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decoder_train_vs_inference():
    cfg = RNNDecoderConfig(num_classes=7, in_channels=12, max_len=4)
    head = RNNDecoderHead(cfg)
    enc = jnp.asarray(rng.standard_normal((3, 12)), jnp.float32)
    tgt = jnp.asarray((rng.random((3, 4, 7)) > 0.5).astype(np.float32))
    variables = head.init(jax.random.key(0), enc, tgt, mode="train")
    probs_train = head.apply(variables, enc, tgt, mode="train")
    assert probs_train.shape == (3, 4, 7)
    assert ((0 <= np.asarray(probs_train)) & (np.asarray(probs_train) <= 1)).all()

    probs_inf = head.apply(variables, enc, mode="inference")
    assert probs_inf.shape == (3, 4, 7)
    # step 0 is identical in both modes (start embedding fed)
    np.testing.assert_allclose(np.asarray(probs_train[:, 0]),
                               np.asarray(probs_inf[:, 0]), rtol=1e-5)

    labels = head.apply(variables, enc, method="decode_greedy")
    assert set(np.unique(np.asarray(labels))) <= {0, 1}


def test_decoder_feedback_loop_changes_steps():
    """Inference must feed back thresholded predictions, so later steps
    differ from teacher forcing with different targets."""
    cfg = RNNDecoderConfig(num_classes=5, in_channels=8, max_len=3)
    head = RNNDecoderHead(cfg)
    enc = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    t_zeros = jnp.zeros((2, 3, 5), jnp.float32)
    t_ones = jnp.ones((2, 3, 5), jnp.float32)
    variables = head.init(jax.random.key(0), enc, t_zeros, mode="train")
    p0 = head.apply(variables, enc, t_zeros, mode="train")
    p1 = head.apply(variables, enc, t_ones, mode="train")
    assert not np.allclose(np.asarray(p0[:, 1:]), np.asarray(p1[:, 1:]))


def test_recognizer3d_and_average_clip():
    model = Recognizer3D(TINY_TS, num_classes=10)
    v = _videos(B=4)  # will act as 2 videos x 2 clips
    variables = model.init(jax.random.key(0), v)
    scores = model.apply(variables, v)
    assert scores.shape == (4, 10)
    avg = model.apply(variables, v, num_segs=2, method="forward_test")
    assert avg.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(avg).sum(-1), 1.0, rtol=1e-4)


def test_recognizer_relseq_train_loss_and_decode():
    dcfg = RNNDecoderConfig(num_classes=6, in_channels=TINY_TS.embed_dims,
                            max_len=3)
    model = Recognizer3DRelseq(TINY_TS, dcfg)
    v = _videos(B=2)
    tgt = jnp.asarray((rng.random((2, 3, 6)) > 0.5).astype(np.float32))
    mask = jnp.ones((2, 3), jnp.float32)
    variables = model.init(jax.random.key(0), v, tgt, mode="train")
    loss = model.apply(variables, v, tgt, mask, method="forward_train",
                       rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(float(loss))
    probs = model.apply(variables, v, num_segs=1, method="forward_test")
    assert probs.shape == (2, 3, 6)


@pytest.mark.full    # full lane: remat numeric identity probe; the model itself stays covered default
def test_remat_flag_preserves_params_and_outputs():
    """cfg.remat rematerializes blocks (jax.checkpoint) without
    changing the parameter tree or the forward/backward math."""
    import jax
    import optax
    kw = dict(num_frames=2, img_size=16, patch_size=8, embed_dims=16,
              num_heads=2, num_layers=2, drop_path_max=0.0,
              dropout_ratio=0.0)
    m0 = Recognizer3D(TimeSformerConfig(**kw), num_classes=3)
    m1 = Recognizer3D(TimeSformerConfig(**kw, remat=True), num_classes=3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2, 16, 16, 3)), jnp.float32)
    v = m0.init(jax.random.key(0), x)
    # same param tree -> remat checkpoints load into either variant
    assert (jax.tree.structure(v) ==
            jax.tree.structure(m1.init(jax.random.key(0), x)))
    np.testing.assert_allclose(np.asarray(m0.apply(v, x)),
                               np.asarray(m1.apply(v, x)), atol=1e-5)
    y = jnp.asarray([0, 1])

    def loss(mod):
        def f(p):
            s = mod.apply({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                s, y).mean()
        return f

    g0 = jax.grad(loss(m0))(v["params"])
    g1 = jax.grad(loss(m1))(v["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
