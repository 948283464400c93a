"""Metric parity tests.

Expected values are computed with independent brute-force loops that follow
the reference formulas (LINAS util/metrics.py, basic/metric.py and
mmaction accuracy.py), then compared to the vectorized implementations.
"""

import numpy as np

from cross_modal_video_engine_tpu.metrics import (
    getScorer, t2v, v2t, t2v_map, v2t_map, get_gt, eval_q2m,
    top_k_accuracy, mean_class_accuracy, confusion_matrix,
    mean_average_precision, mmit_mean_average_precision,
)

rng = np.random.default_rng(42)


# ---- scorers ----------------------------------------------------------------

def _brute_ap(sorted_labels, k=0):
    nr_rel = sum(1 for x in sorted_labels if x > 0)
    if nr_rel == 0:
        return 0.0
    length = len(sorted_labels) if (k <= 0 or k > len(sorted_labels)) else k
    ap, rel = 0.0, 0
    for i in range(length):
        if sorted_labels[i] >= 1:
            rel += 1
            ap += rel / (i + 1.0)
    return ap / nr_rel


def test_ap_scorer_matches_bruteforce():
    scorer = getScorer("AP")
    for _ in range(20):
        labels = list(rng.integers(0, 2, size=rng.integers(1, 30)))
        assert abs(scorer.score(labels) - _brute_ap(labels)) < 1e-12


def test_ap_at_k():
    scorer = getScorer("AP@3")
    labels = [0, 1, 0, 1, 1]
    # within top-3 only the hit at pos 2 counts; nr_relevant is still 3
    assert abs(scorer.score(labels) - (1 / 2) / 3) < 1e-12


def test_rr_p_scorers():
    assert getScorer("RR").score([0, 0, 1, 1]) == 1 / 3
    assert getScorer("RR").score([0, 0]) == 0.0
    assert getScorer("P@2").score([1, 0, 1]) == 0.5
    assert getScorer("P").score([1, 0, 1, 0]) == 0.5


def test_ndcg_scorer():
    s = getScorer("NDCG@4")
    assert abs(s.score([1, 1, 1, 1]) - 1.0) < 1e-12
    val = s.score([0, 1, 1, 0])
    assert 0 < val < 1


# ---- retrieval --------------------------------------------------------------

def _brute_t2v(c2i, n_caption):
    ranks = np.zeros(c2i.shape[0])
    for i in range(len(ranks)):
        inds = np.argsort(c2i[i])
        ranks[i] = np.where(inds == i // n_caption)[0][0]
    return [
        100.0 * np.mean(ranks < 1), 100.0 * np.mean(ranks < 5),
        100.0 * np.mean(ranks < 10),
        np.floor(np.median(ranks)) + 1, ranks.mean() + 1,
    ]


def _brute_v2t(c2i, n_caption):
    ranks = np.zeros(c2i.shape[1])
    for i in range(len(ranks)):
        inds = np.argsort(c2i[:, i])
        ranks[i] = np.where(inds // n_caption == i)[0][0]
    return [
        100.0 * np.mean(ranks < 1), 100.0 * np.mean(ranks < 5),
        100.0 * np.mean(ranks < 10),
        np.floor(np.median(ranks)) + 1, ranks.mean() + 1,
    ]


def test_t2v_v2t_parity():
    n, nc = 20, 5
    c2i = rng.standard_normal((n * nc, n))
    np.testing.assert_allclose(t2v(c2i, n_caption=nc), _brute_t2v(c2i, nc))
    np.testing.assert_allclose(v2t(c2i, n_caption=nc), _brute_v2t(c2i, nc))


def test_get_gt_scheme():
    video_ids = ["v1", "v2"]
    caption_ids = ["v1#0", "v2#0", "v1#1"]
    v2t_gt, t2v_gt = get_gt(video_ids, caption_ids)
    assert v2t_gt == [[0, 2], [1]]
    assert t2v_gt == {0: [0], 2: [0], 1: [1]}


def test_eval_q2m_min_rank():
    scores = np.array([
        [0.1, 0.5, 0.9],   # gt {1,2}: best rank = 2
        [0.9, 0.1, 0.5],   # gt {0}: rank 3
    ])
    r1, r5, r10, medr, meanr = eval_q2m(scores, {0: [1, 2], 1: [0]})
    assert r1 == 0.0
    assert r5 == 100.0
    assert medr == 2.5 and meanr == 2.5


def test_maps():
    n, nc = 8, 2
    c2i = rng.standard_normal((n * nc, n))
    video_ids = [f"v{i}" for i in range(n)]
    caption_ids = [f"v{i // nc}#{i % nc}" for i in range(n * nc)]
    v2t_gt, t2v_gt = get_gt(video_ids, caption_ids)
    # t2v mAP equals mean reciprocal rank of the single GT
    m = t2v_map(c2i, t2v_gt)
    ap = getScorer("AP")
    expect = np.mean([
        ap.score([1 if j == t2v_gt[i][0] else 0 for j in np.argsort(c2i[i])])
        for i in range(c2i.shape[0])
    ])
    assert abs(m - expect) < 1e-12
    m2 = v2t_map(c2i, v2t_gt)
    expect2 = []
    for i in range(c2i.shape[1]):
        labels = np.zeros(c2i.shape[0])
        labels[v2t_gt[i]] = 1
        expect2.append(ap.score(list(labels[np.argsort(c2i[:, i])])))
    assert abs(m2 - np.mean(expect2)) < 1e-12


# ---- recognition accuracy ----------------------------------------------------

def test_top_k_accuracy():
    scores = [np.array([0.1, 0.2, 0.7]), np.array([0.8, 0.1, 0.1]),
              np.array([0.3, 0.4, 0.3])]
    labels = [2, 0, 2]
    top1, top2 = top_k_accuracy(scores, labels, (1, 2))
    assert top1 == 2 / 3
    assert top2 == 1.0


def test_mean_class_accuracy_and_confusion():
    scores = [np.array([0.9, 0.1]), np.array([0.9, 0.1]),
              np.array([0.1, 0.9]), np.array([0.9, 0.1])]
    labels = [0, 0, 1, 1]
    cm = confusion_matrix([0, 0, 1, 0], labels)
    np.testing.assert_array_equal(cm, [[2, 0], [1, 1]])
    assert mean_class_accuracy(scores, labels) == (1.0 + 0.5) / 2


def test_mean_average_precision_perfect_and_random():
    labels = [np.array([1, 0]), np.array([0, 1]), np.array([1, 0])]
    perfect = [np.array([0.9, 0.1]), np.array([0.1, 0.9]), np.array([0.8, 0.2])]
    assert mean_average_precision(perfect, labels) == 1.0
    assert mmit_mean_average_precision(perfect, labels) == 1.0

    # sklearn cross-check
    from sklearn.metrics import average_precision_score
    scores = [rng.standard_normal(4) for _ in range(12)]
    labels = [(rng.random(4) > 0.5).astype(np.float64) for _ in range(12)]
    ours = mean_average_precision(scores, labels)
    sk = []
    st, lt = np.stack(scores).T, np.stack(labels).T
    for s, l in zip(st, lt):
        if l.sum() == 0:
            continue
        sk.append(average_precision_score(l, s))
    np.testing.assert_allclose(ours, np.mean(sk), rtol=1e-10)
