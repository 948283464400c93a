"""Dual encoder tests: BiGRU parity vs torch (packed & unpacked), shapes,
and the embed_* inference surface."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_modal_video_engine_tpu.models import (
    BiGRU, DualEncoding, DualEncodingConfig, VideoBatch, TextBatch,
    make_video_batch, make_text_batch,
)

rng = np.random.default_rng(3)


def _torch_bigru(x, lengths, hidden, params, packed):
    import torch
    import torch.nn as tnn
    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

    B, T, D = x.shape
    gru = tnn.GRU(D, hidden, batch_first=True, bidirectional=True)
    with torch.no_grad():
        for direction, suffix in ((("fwd"), ""), (("bwd"), "_reverse")):
            getattr(gru, f"weight_ih_l0{suffix}").copy_(
                torch.from_numpy(params[f"{direction}_wi"].T))
            getattr(gru, f"bias_ih_l0{suffix}").copy_(
                torch.from_numpy(params[f"{direction}_bi"]))
            getattr(gru, f"weight_hh_l0{suffix}").copy_(
                torch.from_numpy(params[f"{direction}_wh"].T))
            getattr(gru, f"bias_hh_l0{suffix}").copy_(
                torch.from_numpy(params[f"{direction}_bh"]))
    xt = torch.from_numpy(x)
    if packed:
        sl, idx = torch.sort(torch.tensor(lengths), descending=True)
        inv = torch.argsort(idx)
        p = pack_padded_sequence(xt[idx], sl.numpy(), batch_first=True)
        out, _ = gru(p)
        out, _ = pad_packed_sequence(out, batch_first=True, total_length=T)
        return out[inv].detach().numpy()
    out, _ = gru(xt)
    return out.detach().numpy()


@pytest.mark.parametrize("packed", [True, False])
def test_bigru_torch_parity(packed):
    B, T, D, H = 4, 7, 6, 5
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    lengths = np.array([7, 3, 5, 1])
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    if packed:
        # zero out pad frames like the provider does
        x = x * mask[..., None]

    m = BiGRU(H, packed=packed)
    params = m.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(mask))
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(mask)))

    flat = {k: np.asarray(v) for k, v in params["params"].items()}
    want = _torch_bigru(x, lengths, H, flat, packed)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def _tiny_cfg(**kw):
    base = dict(
        visual_feat_dim=16, visual_rnn_size=8, visual_kernel_num=4,
        visual_kernel_sizes=(2, 3), vocab_size=30, bow_vocab_size=20,
        word_dim=12, text_rnn_size=8, text_kernel_num=4,
        text_kernel_sizes=(2, 3), hidden_size=16, common_dim=24,
    )
    base.update(kw)
    return DualEncodingConfig(**base)


def _batches(cfg, B=3, T=10, L=6, S=2):
    feats = [rng.standard_normal((rng.integers(4, T + 4), cfg.visual_feat_dim))
             .astype(np.float32) for _ in range(B)]
    videos = make_video_batch(feats, max_frames=T)
    ids = [list(rng.integers(1, cfg.vocab_size, rng.integers(2, L))) for _ in range(B)]
    bows = rng.random((B, cfg.bow_vocab_size)).astype(np.float32)
    text = make_text_batch(ids, bows, max_words=L)
    s_ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, S, L)), jnp.int32)
    s_mask = jnp.ones((B, S, L), jnp.float32)
    support = TextBatch(
        ids=s_ids, bows=jnp.asarray(rng.random((B, S, cfg.bow_vocab_size)), jnp.float32),
        lengths=jnp.full((B, S), L, jnp.int32), mask=s_mask)
    return videos, text, support


@pytest.mark.full    # full lane: shape probe; BiGRU torch parity + the LINAS train loop stay default
def test_dual_encoding_de_map_shapes():
    cfg = _tiny_cfg()  # style distill, teacher GT, student de+map
    model = DualEncoding(cfg)
    videos, text, support = _batches(cfg)
    variables = model.init(jax.random.key(0), videos, text, support)
    out = model.apply(variables, videos, text, support)
    assert set(out) == {"vid_emb", "cap_emb", "student_cap_emb"}
    for v in out.values():
        assert v.shape == (3, cfg.common_dim)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0,
                                   rtol=1e-4)


@pytest.mark.full    # full lane: style variant; de+map student + GT styles and the LINAS train loop stay default
def test_dual_encoding_text_video_student():
    cfg = _tiny_cfg(student_model="text+video", text_resblock_number=1)
    model = DualEncoding(cfg)
    videos, text, support = _batches(cfg)
    variables = model.init(jax.random.key(0), videos, text, support)
    out = model.apply(variables, videos, text, support)
    assert "student_vid_emb" in out and out["student_vid_emb"].shape == (3, cfg.common_dim)
    # distill inference path uses student towers
    sv = model.apply(variables, videos, method="embed_vis_distill")
    np.testing.assert_allclose(np.asarray(sv), np.asarray(out["student_vid_emb"]),
                               atol=1e-5)


def test_embed_surface_consistency():
    cfg = _tiny_cfg()
    model = DualEncoding(cfg)
    videos, text, support = _batches(cfg)
    variables = model.init(jax.random.key(0), videos, text, support)
    out = model.apply(variables, videos, text, support)
    v = model.apply(variables, videos, method="embed_vis")
    np.testing.assert_allclose(np.asarray(v), np.asarray(out["vid_emb"]), atol=1e-5)
    t_student = model.apply(variables, text, method="embed_txt_distill")
    np.testing.assert_allclose(np.asarray(t_student),
                               np.asarray(out["student_cap_emb"]), atol=1e-5)
    t_gt = model.apply(variables, text, support, method="embed_txt_GT")
    np.testing.assert_allclose(np.asarray(t_gt), np.asarray(out["cap_emb"]), atol=1e-5)


def test_gt_style():
    cfg = _tiny_cfg(style="GT")
    model = DualEncoding(cfg)
    videos, text, support = _batches(cfg)
    variables = model.init(jax.random.key(0), videos, text, support)
    out = model.apply(variables, videos, text, support)
    assert set(out) == {"vid_emb", "cap_emb"}


def test_jit_and_batch_invariance():
    """Padding more videos into the batch must not change a row's embedding."""
    cfg = _tiny_cfg()
    model = DualEncoding(cfg)
    videos, text, support = _batches(cfg, B=3)
    variables = model.init(jax.random.key(0), videos, text, support)
    f = jax.jit(lambda v: model.apply(variables, v, method="embed_vis"))
    full = np.asarray(f(videos))
    solo = VideoBatch(videos.frames[:1], videos.mean_origin[:1],
                      videos.lengths[:1], videos.mask[:1])
    one = np.asarray(f(solo))
    np.testing.assert_allclose(one[0], full[0], rtol=1e-4, atol=1e-5)
