"""Proposal metrics: pairwise temporal IoU, AR@AN, detection AP —
hand-computed goldens (reference semantics: accuracy.py:363-683)."""

import numpy as np

from cross_modal_video_engine_tpu.metrics.proposals import (
    pairwise_temporal_iou, average_recall_at_avg_proposals,
    interpolated_precision_recall, average_precision_at_temporal_iou)

rng = np.random.default_rng(59)


def test_pairwise_temporal_iou_golden_and_loop():
    cand = np.asarray([[0.0, 10.0], [5.0, 15.0]])
    tgt = np.asarray([[0.0, 10.0], [8.0, 12.0]])
    iou = pairwise_temporal_iou(cand, tgt)
    assert iou.shape == (2, 2)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[1, 0], 2 / 12)        # [8,10]/[0,12]
    np.testing.assert_allclose(iou[0, 1], 5 / 15)        # [5,10]/[0,15]
    np.testing.assert_allclose(iou[1, 1], 4 / 10)        # inter 4 / union 10

    # 1-d candidate squeezes
    one = pairwise_temporal_iou(np.asarray([0.0, 10.0]), tgt)
    assert one.shape == (2,)
    np.testing.assert_allclose(one, iou[:, 0])

    # overlap-self = intersection / candidate length
    _, ovl = pairwise_temporal_iou(cand, tgt, calculate_overlap_self=True)
    np.testing.assert_allclose(ovl[0, 1], 5 / 10)

    # random vs explicit loop
    cand = np.sort(rng.uniform(0, 100, (7, 2)), axis=1)
    tgt = np.sort(rng.uniform(0, 100, (5, 2)), axis=1)
    got = pairwise_temporal_iou(cand, tgt)
    for i, c in enumerate(cand):
        for j, t in enumerate(tgt):
            inter = max(0, min(c[1], t[1]) - max(c[0], t[0]))
            union = (c[1] - c[0]) + (t[1] - t[0]) - inter
            np.testing.assert_allclose(got[j, i], inter / union, rtol=1e-5)


def test_ar_at_an_perfect_proposals():
    gt = {f"v{i}": np.asarray([[10.0 * i, 10.0 * i + 5]]) for i in range(4)}
    proposals = {k: np.concatenate([v, np.ones((1, 1))], 1)
                 for k, v in gt.items()}
    recall, avg_recall, ppv, auc = average_recall_at_avg_proposals(
        gt, proposals, total_num_proposals=4)
    assert recall.shape == (10, 100)
    np.testing.assert_allclose(recall[:, -1], 1.0)
    np.testing.assert_allclose(avg_recall[-1], 1.0)
    # with one proposal/video the int() truncation keeps recall at 0 until
    # the 100% percentile (reference accuracy.py:523), so AUC is tiny
    assert 0.0 < auc <= 100.0
    np.testing.assert_allclose(ppv[-1], 1.0)


def test_ar_at_an_half_recall():
    # two videos: one with a perfect proposal, one with a disjoint one
    gt = {"a": np.asarray([[0.0, 10.0]]), "b": np.asarray([[0.0, 10.0]])}
    proposals = {
        "a": np.asarray([[0.0, 10.0, 0.9]]),
        "b": np.asarray([[50.0, 60.0, 0.9]]),
    }
    recall, avg_recall, _, auc = average_recall_at_avg_proposals(
        gt, proposals, total_num_proposals=2)
    np.testing.assert_allclose(recall[:, -1], 0.5)
    np.testing.assert_allclose(avg_recall[-1], 0.5)


def test_interpolated_precision_recall():
    # precision [1, 0.5], recall [0.5, 1] -> AP = 0.5*1 + 0.5*0.5 = 0.75
    ap = interpolated_precision_recall(np.asarray([1.0, 0.5]),
                                       np.asarray([0.5, 1.0]))
    np.testing.assert_allclose(ap, 0.75)


def test_detection_ap_goldens():
    thr = np.asarray([0.5])
    gt = {"v0": np.asarray([[0.0, 10.0]])}
    # one perfect prediction -> AP 1
    pred = [["v0", 0, 0.0, 10.0, 0.9]]
    np.testing.assert_allclose(
        average_precision_at_temporal_iou(gt, pred, thr), [1.0])

    # fp with higher score, then tp: precision at tp = 0.5, recall 1
    pred = [["v0", 0, 50.0, 60.0, 0.95], ["v0", 0, 0.0, 10.0, 0.9]]
    np.testing.assert_allclose(
        average_precision_at_temporal_iou(gt, pred, thr), [0.5])

    # duplicate matches lock the gt: second tp becomes fp
    pred = [["v0", 0, 0.0, 10.0, 0.95], ["v0", 0, 0.1, 10.0, 0.9]]
    np.testing.assert_allclose(
        average_precision_at_temporal_iou(gt, pred, thr), [1.0])

    # unknown video -> fp
    pred = [["vX", 0, 0.0, 10.0, 0.99], ["v0", 0, 0.0, 10.0, 0.9]]
    np.testing.assert_allclose(
        average_precision_at_temporal_iou(gt, pred, thr), [0.5])

    # empty predictions -> zeros
    np.testing.assert_allclose(
        average_precision_at_temporal_iou(gt, [], thr), [0.0])

    # multi-threshold: iou = 0.6 proposal counts at 0.5 but not 0.7
    ap = average_precision_at_temporal_iou(
        gt, [["v0", 0, 0.0, 6.0, 0.9]], np.asarray([0.5, 0.7]))
    np.testing.assert_allclose(ap, [1.0, 0.0])


def test_seq_average_precision_truncates_end_tokens():
    from cross_modal_video_engine_tpu.metrics.accuracy import (
        seq_average_precision)
    C, L = 3, 4          # 2 real classes + end token
    # video 0: steps [cls0, end, end, end] -> keeps 2 steps
    l0 = np.zeros((L, C), np.float32)
    l0[0, 0] = 1
    l0[1:, -1] = 1
    s0 = np.zeros((L, C), np.float32)
    s0[0, 0] = 0.9       # perfect for class 0
    s0[1, -1] = 0.8
    # video 1: steps [cls1, cls0, end, end] -> keeps 3 steps
    l1 = np.zeros((L, C), np.float32)
    l1[0, 1] = 1
    l1[1, 0] = 1
    l1[2:, -1] = 1
    s1 = np.zeros((L, C), np.float32)
    s1[0, 1] = 0.7
    s1[1, 0] = 0.6
    s1[2, -1] = 0.9
    aps = seq_average_precision([s0, s1], [l0, l1])
    assert len(aps) == C
    # both real classes rank their positives first -> AP 1
    np.testing.assert_allclose(aps[0], 1.0)
    np.testing.assert_allclose(aps[1], 1.0)
    # steps beyond the first end token never pollute the pool: a huge
    # score on a truncated step changes nothing
    s0_poison = s0.copy()
    s0_poison[3, 0] = 5.0
    aps2 = seq_average_precision([s0_poison, s1], [l0, l1])
    np.testing.assert_allclose(aps, aps2)
