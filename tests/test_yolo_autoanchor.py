"""AutoAnchor (utils/autoanchor.py — the MCT/yolov5/utils/autoanchor.py
BPR check + kmeans/genetic evolution) and the standalone yolo_val CLI."""

import json
import os

import numpy as np
import pytest

from cross_modal_video_engine_tpu.utils.autoanchor import (
    anchor_metric, check_anchors, dataset_wh, group_anchors, kmean_anchors)

P5_ANCHORS = (((10, 13), (16, 30), (33, 23)),
              ((30, 61), (62, 45), (59, 119)),
              ((116, 90), (156, 198), (373, 326)))


def test_dataset_wh_scaling():
    shapes = np.array([[480, 640]])                 # (h, w)
    labels = [np.array([[0, 0.5, 0.5, 0.5, 0.5]])]  # 320x240 at 640-long
    wh = dataset_wh(shapes, labels, 640)
    np.testing.assert_allclose(wh, [[320.0, 240.0]])


def test_anchor_metric_perfect_and_poor():
    anchors = np.array([[10.0, 10.0], [100.0, 100.0]])
    bpr, aat = anchor_metric(anchors, np.array([[12.0, 9.0]]), thr=4.0)
    assert bpr == 1.0 and aat >= 1.0
    bpr, _ = anchor_metric(np.array([[10.0, 10.0]]),
                           np.array([[400.0, 400.0]]), thr=4.0)
    assert bpr == 0.0


def test_kmean_anchors_fit_dataset():
    rng = np.random.RandomState(0)
    # two wh clusters the default anchors fit poorly at thr=4
    wh = np.concatenate([rng.normal(20, 2, (200, 2)),
                         rng.normal(200, 10, (200, 2))]).clip(3)
    k = kmean_anchors(wh, n=6, img_size=640, gen=200, rng=rng)
    assert k.shape == (6, 2)
    areas = k.prod(1)
    assert (np.diff(areas) >= 0).all()              # sorted small->large
    bpr, _ = anchor_metric(k, wh, thr=4.0)
    assert bpr > 0.99


def test_group_anchors_area_order():
    k = np.array([[10, 10], [20, 20], [30, 30], [40, 40], [50, 50],
                  [60, 60], [70, 70], [80, 80], [90, 90]], np.float32)
    g = group_anchors(k, 3)
    assert len(g) == 3 and all(len(l) == 3 for l in g)
    means = [np.mean([w * h for w, h in l]) for l in g]
    assert means[0] < means[1] < means[2]


def test_check_anchors_keeps_good_fit():
    rng = np.random.RandomState(0)
    shapes = np.full((50, 2), 640.0)
    # boxes sized right at the default anchor scales
    labels = [np.array([[0, 0.5, 0.5, 30 / 640, 60 / 640]])
              for _ in range(50)]
    anchors, bpr, changed = check_anchors(shapes, labels, P5_ANCHORS,
                                          rng=rng)
    assert not changed
    assert anchors == P5_ANCHORS
    assert bpr > 0.98


def test_check_anchors_recomputes_poor_fit():
    rng = np.random.RandomState(0)
    shapes = np.full((80, 2), 640.0)
    # extreme aspect-ratio boxes no default anchor covers at thr=4
    labels = [np.array([[0, 0.5, 0.5, 0.9, 0.01]]) for _ in range(40)]
    labels += [np.array([[0, 0.5, 0.5, 0.01, 0.9]]) for _ in range(40)]
    anchors, bpr, changed = check_anchors(shapes, labels, P5_ANCHORS,
                                          gen=300, rng=rng)
    assert changed
    flat = np.asarray([a for l in anchors for a in l])
    wh = dataset_wh(shapes, labels, 640)
    new_bpr, _ = anchor_metric(flat, wh)
    old_bpr, _ = anchor_metric(
        np.asarray([a for l in P5_ANCHORS for a in l]), wh)
    assert new_bpr > old_bpr


@pytest.mark.full    # full lane: 50s val-CLI run; the seg e2e (masks route)
# and det e2e (eval_runs) in test_yolo_train.py drive yolo_val every round
def test_yolo_val_cli(tmp_path):
    from cross_modal_video_engine_tpu.cli import yolo_train, yolo_val
    from cross_modal_video_engine_tpu.config import Config
    from tests.test_yolo_train import TINY, _synthetic_dataset

    img_dir, lbl_dir = _synthetic_dataset(str(tmp_path))
    cfg_py = tmp_path / "cfg.py"
    cfg_py.write_text(
        f"model = dict(**{TINY!r})\n"
        f"data = dict(train=dict(img_dir={img_dir!r},"
        f" label_dir={lbl_dir!r}),"
        f" val=dict(img_dir={img_dir!r}, label_dir={lbl_dir!r}),"
        f" batch_size=3, max_targets=4)\n"
        "aug = dict(mosaic=0.0, scale=0.0, translate=0.0)\n"
        "optimizer = dict(lr0=0.02, warmup_epochs=0.0)\n"
        "eval_interval = 1\n")
    work = str(tmp_path / "work")
    os.makedirs(work)
    yolo_train.main([str(cfg_py), "--work_dir", work,
                     "--total_epochs", "1"])
    assert os.path.isdir(os.path.join(work, "best"))
    report = yolo_val.main([str(cfg_py), "--checkpoint",
                            os.path.join(work, "best")])
    assert set(report) >= {"map50", "map", "precision", "recall"}

    # --augment (val.py TTA) runs end-to-end and reports the same schema
    report_tta = yolo_val.main([str(cfg_py), "--checkpoint",
                                os.path.join(work, "best"), "--augment"])
    assert set(report_tta) >= {"map50", "map", "precision", "recall"}
    assert 0.0 <= report_tta["map50"] <= 1.0
