"""Similarity ops + loss parity vs brute-force numpy following the reference
formulas (LINAS loss.py:7-153, seqmll_loss.py:10-24)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cross_modal_video_engine_tpu.ops.similarity import (
    cosine_sim, euclidean_sim, l1_sim, l1_sim_norm, l2_sim_norm,
    jaccard_sim, order_sim, get_sim, l2norm, cal_error,
)
from cross_modal_video_engine_tpu.losses import (
    triplet_loss, TripletLossConfig,
    multilabel_categorical_crossentropy, seq_mll_loss,
    mse_distill, similarity_distill, huber,
    info_nce_logits, clip_contrastive_loss,
)

rng = np.random.default_rng(0)
IM = rng.standard_normal((6, 8)).astype(np.float32)
S = rng.standard_normal((9, 8)).astype(np.float32)


def _bc(im, s):
    # (n_s, n_im, d) broadcast difference like the reference
    return s[:, None, :] - im[None, :, :]


def test_cosine():
    np.testing.assert_allclose(np.asarray(cosine_sim(IM, S)), IM @ S.T, rtol=1e-5)


def test_euclidean():
    expect = -(np.power(_bc(IM, S), 2).sum(2)).T
    np.testing.assert_allclose(np.asarray(euclidean_sim(IM, S)), expect, rtol=1e-4, atol=1e-4)


def test_l1_variants():
    expect = -np.abs(_bc(IM, S)).sum(2).T
    np.testing.assert_allclose(np.asarray(l1_sim(IM, S)), expect, rtol=1e-5)
    expect_n = np.abs(_bc(IM, S)).sum(2).T / IM.shape[1] - 1
    np.testing.assert_allclose(np.asarray(l1_sim_norm(IM, S)), expect_n,
                               rtol=1e-5, atol=1e-6)
    expect_l2n = np.power(_bc(IM, S), 2).sum(2).T / IM.shape[1] - 1
    np.testing.assert_allclose(np.asarray(l2_sim_norm(IM, S)), expect_l2n, rtol=1e-4, atol=1e-4)


def test_order():
    ymx = np.clip(_bc(IM, S), 0, None)
    expect = -np.sqrt(np.power(ymx, 2).sum(2)).T
    np.testing.assert_allclose(np.asarray(order_sim(IM, S)), expect, rtol=1e-5)


def test_jaccard():
    a = np.abs(rng.standard_normal((4, 5))).astype(np.float32)
    b = np.abs(rng.standard_normal((3, 5))).astype(np.float32)
    inter = np.minimum(a[:, None, :], b[None, :, :]).sum(-1)
    union = np.maximum(a[:, None, :], b[None, :, :]).sum(-1)
    np.testing.assert_allclose(np.asarray(jaccard_sim(a, b)), inter / union, rtol=1e-5)


def test_get_sim_registry():
    assert get_sim("cosine") is cosine_sim


def test_l2norm():
    x = np.asarray(l2norm(jnp.asarray(IM)))
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, rtol=1e-5)


def test_cal_error_orientation_and_blocking():
    vid = l2norm(jnp.asarray(IM))
    cap = l2norm(jnp.asarray(S))
    err = np.asarray(cal_error(vid, cap))
    assert err.shape == (9, 6)
    np.testing.assert_allclose(err, -(np.asarray(cap) @ np.asarray(vid).T),
                               rtol=1e-5, atol=1e-6)
    err_b = np.asarray(cal_error(vid, cap, block=4))
    np.testing.assert_allclose(err_b, err, rtol=1e-5, atol=1e-6)


# ---- triplet loss ------------------------------------------------------------

def _brute_triplet(s, im, margin, max_violation, cost_style, direction):
    scores = im @ s.T
    d = np.diag(scores)
    n = scores.shape[0]
    cost_s = np.zeros_like(scores)
    cost_im = np.zeros_like(scores)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if direction in ("v2t", "all"):
                cost_s[i, j] = max(0, margin + scores[i, j] - d[i])
            if direction in ("t2v", "all"):
                cost_im[i, j] = max(0, margin + scores[i, j] - d[j])
    total = 0.0
    if direction in ("v2t", "all"):
        c = cost_s.max(1) if max_violation else cost_s
        total += c.sum() if cost_style == "sum" else c.mean()
    if direction in ("t2v", "all"):
        c = cost_im.max(0) if max_violation else cost_im
        total += c.sum() if cost_style == "sum" else c.mean()
    return total


def test_triplet_loss_parity():
    B, D = 7, 5
    s = rng.standard_normal((B, D)).astype(np.float32)
    im = rng.standard_normal((B, D)).astype(np.float32)
    s = s / np.linalg.norm(s, axis=1, keepdims=True)
    im = im / np.linalg.norm(im, axis=1, keepdims=True)
    for mv in (False, True):
        for style in ("sum", "mean"):
            for direction in ("all", "t2v", "v2t"):
                cfg = TripletLossConfig(margin=0.2, max_violation=mv,
                                        cost_style=style, direction=direction)
                got = float(triplet_loss(jnp.asarray(s), jnp.asarray(im), cfg))
                want = _brute_triplet(s, im, 0.2, mv, style, direction)
                np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---- seq MLL loss ------------------------------------------------------------

def _brute_mll(y_true, y_pred):
    y_pred = (1 - 2 * y_true) * y_pred
    y_pred_neg = y_pred - y_true * 1e12
    y_pred_pos = y_pred - (1 - y_true) * 1e12
    zeros = np.zeros_like(y_pred[:, :1])
    neg = np.concatenate([y_pred_neg, zeros], axis=-1)
    pos = np.concatenate([y_pred_pos, zeros], axis=-1)
    lse = lambda x: np.log(np.sum(np.exp(x - x.max(-1, keepdims=True)), -1)) + x.max(-1)
    return lse(neg) + lse(pos)


def test_mll_crossentropy_parity():
    y_true = (rng.random((5, 6)) > 0.5).astype(np.float32)
    y_pred = rng.standard_normal((5, 6)).astype(np.float32)
    got = np.asarray(multilabel_categorical_crossentropy(
        jnp.asarray(y_true), jnp.asarray(y_pred)))
    np.testing.assert_allclose(got, _brute_mll(y_true, y_pred), rtol=1e-4)


def test_seq_mll_masking():
    N, T, C = 3, 4, 5
    score = rng.standard_normal((N, T, C)).astype(np.float32)
    label = (rng.random((N, T + 1, C)) > 0.5).astype(np.float32)
    mask = np.ones((N, T + 1), np.float32)
    mask[:, 2:] = 0.0  # only first 2 steps count
    got = float(seq_mll_loss(jnp.asarray(score), jnp.asarray(label), jnp.asarray(mask)))
    per = _brute_mll(label[:, :T].reshape(-1, C), score.reshape(-1, C))
    want = (per * mask[:, :T].reshape(-1)).sum() / N
    np.testing.assert_allclose(got, want, rtol=1e-4)


# ---- distill -----------------------------------------------------------------

def test_huber_and_distill():
    a = np.array([0.0, 0.5, 2.0], np.float32)
    b = np.zeros(3, np.float32)
    np.testing.assert_allclose(np.asarray(huber(jnp.asarray(a), jnp.asarray(b))),
                               [0.0, 0.125, 1.5])
    x = rng.standard_normal((4, 3)).astype(np.float32)
    y = rng.standard_normal((4, 3)).astype(np.float32)
    assert abs(float(mse_distill(jnp.asarray(x), jnp.asarray(y))) -
               ((x - y) ** 2).sum()) < 1e-4
    v = rng.standard_normal((4, 3)).astype(np.float32)
    c = rng.standard_normal((4, 3)).astype(np.float32)
    loss_diag = float(similarity_distill(
        jnp.asarray(v), jnp.asarray(c), jnp.asarray(x), jnp.asarray(y),
        similarity_type="diag"))
    s1, s2 = v @ c.T, x @ y.T
    d = s1 - s2
    h = np.where(np.abs(d) < 1, 0.5 * d * d, np.abs(d) - 0.5)
    np.testing.assert_allclose(loss_diag, np.diagonal(h).sum(), rtol=1e-4)
    loss_maxdiag = float(similarity_distill(
        jnp.asarray(v), jnp.asarray(c), jnp.asarray(x), jnp.asarray(y),
        similarity_type="maxdiag"))
    np.testing.assert_allclose(loss_maxdiag, -np.diagonal(s2).sum(), rtol=1e-4)


# ---- contrastive --------------------------------------------------------------

def test_contrastive():
    pred = rng.standard_normal((4, 3)).astype(np.float32)
    pred /= np.linalg.norm(pred, axis=1, keepdims=True)
    logits = info_nce_logits(jnp.asarray(pred), jnp.asarray(pred))
    # perfect alignment -> diagonal dominates at scale 100 -> loss ~ 0
    assert float(clip_contrastive_loss(logits)) < 1e-3


def test_similarity_distill_svd_matches_torch_replica():
    """'svd' spectral variant vs an exact torch.svd replica of
    LINAS-engine/model.py:849-853 (incl. its V-not-V^T quirk)."""
    import torch
    from cross_modal_video_engine_tpu.losses.distill import (
        similarity_distill)

    g = np.random.default_rng(12)
    ve = g.standard_normal((6, 8)).astype(np.float32)
    ce = g.standard_normal((6, 8)).astype(np.float32)
    sv = g.standard_normal((6, 8)).astype(np.float32)
    sc = g.standard_normal((6, 8)).astype(np.float32)

    got = float(similarity_distill(ve, ce, sv, sc, similarity_type="svd"))

    def torch_xform(s):
        a, b, c = torch.svd(s)
        return torch.matmul(a, torch.matmul(torch.diag(torch.log(b)), c))

    t1 = torch_xform(torch.from_numpy(ve) @ torch.from_numpy(ce).T)
    t2 = torch_xform(torch.from_numpy(sv) @ torch.from_numpy(sc).T)
    want = float(torch.nn.SmoothL1Loss(reduction="sum")(t1, t2))
    assert got == pytest.approx(want, rel=2e-3)


def test_similarity_distill_svd_has_gradient():
    import jax
    from cross_modal_video_engine_tpu.losses.distill import (
        similarity_distill)

    g = np.random.default_rng(1)
    ve = jnp.asarray(g.standard_normal((4, 5)), jnp.float32)
    ce = jnp.asarray(g.standard_normal((4, 5)), jnp.float32)
    sv = jnp.asarray(g.standard_normal((4, 5)), jnp.float32)
    sc = jnp.asarray(g.standard_normal((4, 5)), jnp.float32)
    grad = jax.grad(lambda x: similarity_distill(
        ve, ce, x, sc, similarity_type="svd"))(sv)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0


def test_similarity_distill_eig_matches_numpy_replica():
    from cross_modal_video_engine_tpu.losses.distill import (
        huber, similarity_distill)

    g = np.random.default_rng(7)
    ve = g.standard_normal((5, 6)).astype(np.float32)
    ce = g.standard_normal((5, 6)).astype(np.float32)
    sv = g.standard_normal((5, 6)).astype(np.float32)
    sc = g.standard_normal((5, 6)).astype(np.float32)

    got = float(similarity_distill(ve, ce, sv, sc, similarity_type="eig"))

    def xform(s):
        w, v = np.linalg.eig(s.astype(np.float64))
        return np.real(v @ np.diag(w.real) @ np.linalg.inv(v))

    t1 = xform(ve @ ce.T)
    t2 = xform(sv @ sc.T)
    want = float(np.sum(np.asarray(huber(jnp.asarray(t1, jnp.float32),
                                         jnp.asarray(t2, jnp.float32)))))
    assert got == pytest.approx(want, rel=1e-3)
