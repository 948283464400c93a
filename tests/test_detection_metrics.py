"""Detection mAP stack (metrics/detection.py) vs hand-computed goldens and
a torch/yolov5-style replica check on random boxes."""

import numpy as np
import pytest

from cross_modal_video_engine_tpu.metrics.detection import (
    DEFAULT_IOUS, ap_per_class, average_precision, box_iou, detection_map,
    match_predictions)

rng = np.random.default_rng(5)


def test_box_iou_golden():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_match_predictions_greedy_unique():
    # two predictions chase one gt: only the higher-IoU one matches
    gt = np.array([[0, 0, 10, 10]], float)
    preds = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], float)
    tp = match_predictions(preds, np.zeros(2), gt, np.zeros(1),
                           np.array([0.5]))
    assert tp[0, 0] and not tp[1, 0]


def test_match_predictions_class_must_agree():
    gt = np.array([[0, 0, 10, 10]], float)
    preds = np.array([[0, 0, 10, 10]], float)
    tp = match_predictions(preds, np.array([1]), gt, np.array([0]),
                           np.array([0.5]))
    assert not tp.any()


def test_average_precision_perfect_and_worst():
    assert average_precision(np.array([1.0]), np.array([1.0])) \
        == pytest.approx(1.0, abs=0.01)
    assert average_precision(np.array([0.0]), np.array([0.0])) \
        == pytest.approx(0.0, abs=0.01)


def test_detection_map_perfect():
    preds = [dict(boxes=np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
                  scores=np.array([0.9, 0.8]),
                  classes=np.array([0, 1]))]
    gts = [dict(boxes=preds[0]["boxes"].copy(),
                classes=np.array([0, 1]))]
    out = detection_map(preds, gts)
    assert out["map50"] == pytest.approx(1.0, abs=0.01)
    assert out["map"] == pytest.approx(1.0, abs=0.01)
    assert out["recall"] == pytest.approx(1.0, abs=1e-6)


def test_detection_map_false_positive_halves_precision():
    preds = [dict(
        boxes=np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float),
        scores=np.array([0.9, 0.3]),       # FP ranked below the TP
        classes=np.array([0, 0]))]
    gts = [dict(boxes=np.array([[0, 0, 10, 10]], float),
                classes=np.array([0]))]
    out = detection_map(preds, gts)
    # TP first -> AP stays ~1.0 (precision envelope holds at recall 1)
    assert out["map50"] == pytest.approx(1.0, abs=0.02)
    # yolov5 val.py reports P/R at the max-F1 confidence: thresholding
    # at ~0.9 keeps the TP and drops the 0.3-conf FP, so P = R = 1.
    assert out["precision"] == pytest.approx(1.0, abs=1e-3)
    assert out["recall"] == pytest.approx(1.0, abs=1e-3)

    # FP ranked ABOVE the TP drags AP to ~0.5
    preds[0]["scores"] = np.array([0.3, 0.9])
    out = detection_map(preds, gts)
    assert out["map50"] == pytest.approx(0.5, abs=0.02)


def test_detection_map_missed_gt_lowers_recall():
    preds = [dict(boxes=np.array([[0, 0, 10, 10]], float),
                  scores=np.array([0.9]), classes=np.array([0]))]
    gts = [dict(boxes=np.array([[0, 0, 10, 10], [30, 30, 40, 40]], float),
                classes=np.array([0, 0]))]
    out = detection_map(preds, gts)
    assert out["recall"] == pytest.approx(0.5, abs=1e-6)
    # yolov5's 101-pt interp linearly bridges the (0.5, 1.0) -> (1.0, 0.0)
    # tail, giving 0.5 + 0.25 for this curve (utils/metrics.py:98-127)
    assert out["map50"] == pytest.approx(0.75, abs=0.02)


def test_localization_quality_degrades_high_iou_levels():
    # a sloppy box (IoU = 100/120 ~ 0.83) counts at levels 0.5..0.8 (7 of
    # 10) but fails 0.85..0.95, so map ~ 0.7 while map50 stays 1.0
    preds = [dict(boxes=np.array([[0, 0, 10, 12]], float),
                  scores=np.array([0.9]), classes=np.array([0]))]
    gts = [dict(boxes=np.array([[0, 2, 10, 12]], float),
                classes=np.array([0]))]
    out = detection_map(preds, gts)
    assert out["map50"] > 0.9
    assert 0.6 < out["map"] < 0.75


def test_ap_per_class_against_torch_replica():
    """Replicate the reference ap_per_class/compute_ap pipeline inline on
    random matches and check parity (yolov5 utils/metrics.py:31-127)."""
    n = 200
    conf = rng.random(n)
    pred_cls = rng.integers(0, 3, n)
    target_cls = np.concatenate([np.full(30, c) for c in range(3)])
    tp = (rng.random((n, len(DEFAULT_IOUS)))
          < np.linspace(0.7, 0.2, len(DEFAULT_IOUS))).astype(float)
    # monotone: a TP at a high IoU level is a TP at lower levels
    tp = (np.flip(np.maximum.accumulate(np.flip(tp, 1), 1), 1) > 0).astype(float)

    classes, ap, _, _ = ap_per_class(tp, conf, pred_cls, target_cls)

    # reference replica
    order = np.argsort(-conf)
    tp_s, cls_s = tp[order], pred_cls[order]
    uniq, nt = np.unique(target_cls, return_counts=True)
    ref_ap = np.zeros((len(uniq), tp.shape[1]))
    for ci, c in enumerate(uniq):
        sel = cls_s == c
        if not sel.any():
            continue
        tpc = tp_s[sel].cumsum(0)
        fpc = (1 - tp_s[sel]).cumsum(0)
        recall = tpc / (nt[ci] + 1e-16)
        precision = tpc / (tpc + fpc)
        for j in range(tp.shape[1]):
            mrec = np.concatenate(([0.0], recall[:, j], [1.0]))
            mpre = np.concatenate(([1.0], precision[:, j], [0.0]))
            mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
            x = np.linspace(0, 1, 101)
            ref_ap[ci, j] = np.trapz(np.interp(x, mrec, mpre), x)
    np.testing.assert_allclose(ap, ref_ap, atol=1e-9)


def test_mask_iou_pairwise():
    from cross_modal_video_engine_tpu.metrics.detection import mask_iou
    a = np.zeros((2, 4, 4), bool)
    a[0, :2, :2] = True          # area 4
    a[1] = True                  # area 16
    b = np.zeros((1, 4, 4), bool)
    b[0, :2, :] = True           # area 8; inter(a0)=4, inter(a1)=8
    iou = mask_iou(a, b)
    assert iou.shape == (2, 1)
    assert np.isclose(iou[0, 0], 4 / 8, atol=1e-6)
    assert np.isclose(iou[1, 0], 8 / 16, atol=1e-6)


def test_segmentation_map_perfect_and_mismatched_masks():
    """Box branch perfect either way; mask branch drops when the
    predicted mask misses the GT pixels (segment/val.py process_batch
    with masks=True)."""
    from cross_modal_video_engine_tpu.metrics.detection import (
        segmentation_map)
    H = W = 16
    gt_mask = np.zeros((1, H, W), bool)
    gt_mask[0, 2:10, 2:10] = True
    gt = [dict(boxes=np.array([[2.0, 2.0, 10.0, 10.0]]),
               classes=np.array([0]), masks=gt_mask)]

    pred_good = [dict(boxes=np.array([[2.0, 2.0, 10.0, 10.0]]),
                      scores=np.array([0.9]), classes=np.array([0]),
                      masks=gt_mask.copy())]
    res = segmentation_map(pred_good, gt)
    # 0.995 = the 101-point envelope's value for one perfect detection
    # (yolov5 compute_ap gives the same)
    assert res["boxes"]["map50"] == pytest.approx(0.995, abs=1e-3)
    assert res["masks"]["map50"] == pytest.approx(0.995, abs=1e-3)

    off_mask = np.zeros((1, H, W), bool)
    off_mask[0, 11:15, 11:15] = True        # IoU 0 vs gt
    pred_off = [dict(boxes=np.array([[2.0, 2.0, 10.0, 10.0]]),
                     scores=np.array([0.9]), classes=np.array([0]),
                     masks=off_mask)]
    res = segmentation_map(pred_off, gt)
    assert res["boxes"]["map50"] == pytest.approx(0.995, abs=1e-3)
    assert res["masks"]["map50"] == pytest.approx(0.0, abs=1e-6)
