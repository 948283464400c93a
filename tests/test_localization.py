"""Localization losses (BMN/BSN/SSN) + tiny-synthetic training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cross_modal_video_engine_tpu.losses.localization import (
    binary_logistic_regression_loss, bmn_tem_loss, bmn_pem_cls_loss,
    bmn_pem_reg_loss, bsn_tem_loss, bsn_pem_loss, ohem_hinge_loss, ssn_loss)
from cross_modal_video_engine_tpu.models.bmn import BMN, BMNConfig
from cross_modal_video_engine_tpu.models.bsn import TEM, PEM
from cross_modal_video_engine_tpu.models.ssn import (SSNConfig, SSNHead,
                                                     stpp_matrix)
from cross_modal_video_engine_tpu.train.localization_trainer import (
    bm_mask, bmn_labels, bsn_tem_labels, sample_ssn_proposals,
    SSNSamplerConfig, make_bmn_train_step, make_bsn_tem_train_step,
    make_bsn_pem_train_step, make_ssn_train_step)

rng = np.random.default_rng(31)


def _blr_numpy(pred, label, threshold=0.5, lo=1.05, hi=21, eps=1e-5):
    pred, label = pred.reshape(-1), label.reshape(-1)
    pmask = (label > threshold).astype(np.float64)
    num_pos = max(pmask.sum(), 1.0)
    ratio = np.clip(len(label) / num_pos, lo, hi)
    c0, c1 = 0.5 * ratio / (ratio - 1), 0.5 * ratio
    loss = (c1 * pmask * np.log(pred + eps)
            + c0 * (1 - pmask) * np.log(1 - pred + eps))
    return -loss.mean()


def test_blr_loss_matches_formula():
    pred = rng.uniform(0.01, 0.99, (2, 30)).astype(np.float32)
    label = rng.uniform(0, 1, (2, 30)).astype(np.float32)
    got = float(binary_logistic_regression_loss(jnp.asarray(pred),
                                                jnp.asarray(label)))
    np.testing.assert_allclose(got, _blr_numpy(pred, label), rtol=1e-5)
    # tem loss = start + end BLR
    got_tem = float(bmn_tem_loss(jnp.asarray(pred), jnp.asarray(pred),
                                 jnp.asarray(label), jnp.asarray(label)))
    np.testing.assert_allclose(got_tem, 2 * _blr_numpy(pred, label),
                               rtol=1e-5)


def test_bmn_pem_cls_matches_formula():
    T = 16
    gt = rng.uniform(0, 1, (1, T, T)).astype(np.float32)
    pred = rng.uniform(0.05, 0.95, (1, T, T)).astype(np.float32)
    mask = bm_mask(T)[None]
    gtm = gt * mask
    pmask = (gtm > 0.9).astype(np.float64)
    nmask = ((gtm <= 0.9).astype(np.float64)) * mask
    num_pos = max(pmask.sum(), 1.0)
    num_entries = num_pos + nmask.sum()
    ratio = np.clip(num_entries / num_pos, 1.05, 21)
    want = -(0.5 * ratio * np.log(pred + 1e-5) * pmask
             + 0.5 * ratio / (ratio - 1) * np.log(1 - pred + 1e-5) * nmask
             ).sum() / num_entries
    got = float(bmn_pem_cls_loss(jnp.asarray(pred), jnp.asarray(gtm),
                                 jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bmn_pem_reg_perfect_prediction_is_zero():
    T = 16
    segs = np.asarray([[0.2, 0.6]])
    gt_iou_map, _, _ = bmn_labels(segs, T)
    mask = bm_mask(T)
    loss = bmn_pem_reg_loss(jnp.asarray(gt_iou_map[None]),
                            jnp.asarray(gt_iou_map[None]),
                            jnp.asarray(mask[None]), jax.random.key(0))
    assert float(loss) < 1e-10
    # and positive when the prediction is off
    loss2 = bmn_pem_reg_loss(jnp.zeros((1, T, T)),
                             jnp.asarray(gt_iou_map[None]),
                             jnp.asarray(mask[None]), jax.random.key(0))
    assert float(loss2) > 0


def test_ohem_hinge_matches_loop_and_grad():
    N, C, G = 8, 5, 4
    pred = rng.normal(size=(N, C)).astype(np.float32)
    labels = rng.integers(1, C + 1, N).astype(np.int32)
    for is_pos, ratio in ((1, 1.0), (-1, 0.5)):
        keep = max(1, int(G * ratio))
        losses = np.maximum(
            0, 1 - is_pos * pred[np.arange(N), labels - 1])
        want = sum(np.sort(g)[::-1][:keep].sum()
                   for g in losses.reshape(-1, G))
        fn = lambda p: ohem_hinge_loss(p, jnp.asarray(labels), is_pos,
                                       ratio, G)
        got = float(fn(jnp.asarray(pred)))
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # gradient only flows through kept entries, slope -is_positive
        g = np.asarray(jax.grad(fn)(jnp.asarray(pred)))
        assert set(np.unique(g)).issubset({0.0, -float(is_pos)})
        assert np.count_nonzero(g) <= keep * (N // G)


def test_bmn_label_generation():
    T = 10
    gt_iou_map, gt_start, gt_end = bmn_labels(np.asarray([[0.3, 0.7]]), T)
    assert gt_iou_map.shape == (T, T)
    # the exact anchor [0.3, 0.7] = start 3, duration 4 has iou 1
    np.testing.assert_allclose(gt_iou_map[3, 3], 1.0)
    # reference boundary anchors are 2-gap wide (_temporal_anchors
    # (-0.5, 1.5), bmn.py:134) and the window is 3/T wide
    # (gt_len_pad = 3/tscale): the IoP profile around each boundary is
    # [.5, 1, 1, .5] over the four overlapping anchors
    np.testing.assert_allclose(gt_start, [0, .5, 1, 1, .5, 0, 0, 0, 0, 0],
                               atol=1e-7)
    np.testing.assert_allclose(gt_end, [0, 0, 0, 0, 0, .5, 1, 1, .5, 0],
                               atol=1e-7)
    act, st, en = bsn_tem_labels(np.asarray([[0.3, 0.7]]), T)
    np.testing.assert_allclose(act[3:7], 1.0)
    np.testing.assert_allclose(act[:3], 0.0, atol=1e-12)
    # the 0.1-wide boundary window half-covers the snippets either side
    np.testing.assert_allclose(st[2:4], 0.5)
    np.testing.assert_allclose(en[6:8], 0.5)


def test_bmn_trains_on_synthetic():
    T, F = 16, 8
    cfg = BMNConfig(temporal_dim=T, feat_dim=F, num_samples=4,
                    max_duration=T, hidden_1d=16, hidden_2d=8, hidden_3d=16)
    model = BMN(cfg)
    feats = rng.normal(size=(2, T, F)).astype(np.float32)
    segs = [np.asarray([[0.25, 0.75]]), np.asarray([[0.1, 0.4]])]
    labels = [bmn_labels(s, T) for s in segs]
    gt_iou = jnp.asarray(np.stack([l[0] for l in labels]))
    gt_start = jnp.asarray(np.stack([l[1] for l in labels]))
    gt_end = jnp.asarray(np.stack([l[2] for l in labels]))
    mask = jnp.asarray(np.broadcast_to(bm_mask(T), (2, T, T)))

    params = model.init(jax.random.key(0), jnp.asarray(feats))["params"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    step = make_bmn_train_step(model, tx)
    hist = []
    for i in range(30):
        params, opt_state, m = step(params, opt_state, jnp.asarray(feats),
                                    gt_iou, gt_start, gt_end, mask,
                                    jax.random.key(i))
        hist.append(float(m["loss"]))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 0.8, hist[::10]


def test_bsn_trains_on_synthetic():
    T, F = 16, 8
    tem = TEM(hidden=16)
    feats = rng.normal(size=(2, T, F)).astype(np.float32)
    act, st, en = bsn_tem_labels(np.asarray([[0.25, 0.75]]), T)
    gt_a = jnp.asarray(np.stack([act, act]))
    gt_s = jnp.asarray(np.stack([st, st]))
    gt_e = jnp.asarray(np.stack([en, en]))
    params = tem.init(jax.random.key(0), jnp.asarray(feats))["params"]
    tx = optax.adam(5e-3)
    step = make_bsn_tem_train_step(tem, tx)
    opt_state = tx.init(params)
    hist = []
    for _ in range(30):
        params, opt_state, m = step(params, opt_state, jnp.asarray(feats),
                                    gt_a, gt_s, gt_e)
        hist.append(float(m["loss"]))
    assert hist[-1] < hist[0] * 0.9

    pem = PEM(hidden=8)
    pfeats = rng.normal(size=(12, 24)).astype(np.float32)
    gt_iou = rng.uniform(0, 1, 12).astype(np.float32)
    params = pem.init(jax.random.key(0), jnp.asarray(pfeats))["params"]
    opt_state = tx.init(params)
    step = make_bsn_pem_train_step(pem, tx)
    hist = []
    for _ in range(40):
        params, opt_state, m = step(params, opt_state, jnp.asarray(pfeats),
                                    jnp.asarray(gt_iou))
        hist.append(float(m["loss"]))
    assert hist[-1] < hist[0]


def test_ssn_sampler_and_training():
    T, F, C = 20, 8, 3
    scfg = SSNSamplerConfig(positive_per_video=2, incomplete_per_video=4,
                            background_per_video=2)
    gt_segments = np.asarray([[5.0, 15.0]])
    gt_labels = np.asarray([2])
    # candidate proposals: exact, shifted-inside, outside
    proposals = np.asarray([
        [5.0, 15.0], [5.5, 14.0], [6.0, 15.5],      # positive-ish
        [5.0, 7.0], [12.0, 15.0], [7.0, 9.0], [10.0, 13.0],  # incomplete
        [0.0, 2.0], [17.0, 19.0],                    # background
    ])
    batch = sample_ssn_proposals(proposals, gt_segments, gt_labels, scfg,
                                 np.random.default_rng(0))
    P = scfg.positive_per_video + scfg.incomplete_per_video + \
        scfg.background_per_video
    assert batch["proposals"].shape == (P, 2)
    assert (batch["proposal_type"] == [0, 0, 1, 1, 1, 1, 2, 2]).all()
    assert (batch["labels"][:6] == 2).all()
    assert (batch["labels"][6:] == 0).all()

    cfg = SSNConfig(feat_dim=F, num_classes=C, hidden=16)
    head = SSNHead(cfg)
    feats = rng.normal(size=(T, F)).astype(np.float32)
    stpp = jnp.asarray(stpp_matrix(T, batch["proposals"]))
    params = head.init(jax.random.key(0), jnp.asarray(feats), stpp)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_ssn_train_step(head, tx, scfg)
    hist = []
    for _ in range(40):
        params, opt_state, m = step(
            params, opt_state, jnp.asarray(feats), stpp,
            jnp.asarray(batch["labels"]), jnp.asarray(batch["proposal_type"]),
            jnp.asarray(batch["bbox_targets"]))
        hist.append(float(m["loss"]))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 0.8, hist[::10]
    assert {"loss_activity", "loss_completeness", "loss_reg"} <= set(m)


def test_bsn_pem_weighted_loss_umasks():
    """Reference u-mask semantics (bsn.py:313-349): all high-iou rows
    kept; medium/low subsampled to ~u_ratio_m/u_ratio_l x the high
    count; weighted mean of elementwise smooth-L1."""
    from cross_modal_video_engine_tpu.losses.localization import (
        bsn_pem_weighted_loss)
    key = jax.random.key(3)
    gt = jnp.asarray(np.concatenate([
        np.full(10, 0.9), np.full(40, 0.4), np.full(200, 0.05)]),
        jnp.float32)
    pred = jnp.zeros_like(gt)
    loss = float(bsn_pem_weighted_loss(pred, gt, key))
    assert np.isfinite(loss) and loss > 0
    # perfect predictions zero the loss regardless of masks
    assert float(bsn_pem_weighted_loss(gt, gt, key)) == 0.0
    # all-high batch: every row kept -> equals the plain mean smooth-L1
    gt_h = jnp.full((16,), 0.8)
    pred_h = jnp.full((16,), 0.3)
    expect = float(jnp.mean(optax.huber_loss(pred_h, gt_h, delta=1.0)))
    got = float(bsn_pem_weighted_loss(pred_h, gt_h, key))
    assert abs(got - expect) < 1e-6
    # weighted PEM step trains
    pem = PEM(hidden=8)
    feats = rng.normal(size=(64, 12)).astype(np.float32)
    gt_iou = rng.uniform(0, 1, 64).astype(np.float32)
    params = pem.init(jax.random.key(0), jnp.asarray(feats))["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = make_bsn_pem_train_step(pem, tx, weighted=True)
    k = jax.random.key(0)
    hist = []
    for _ in range(30):
        k, sub = jax.random.split(k)
        params, opt_state, m = step(params, opt_state, jnp.asarray(feats),
                                    jnp.asarray(gt_iou), sub)
        hist.append(float(m["loss"]))
    assert hist[-1] < hist[0]
