"""AVA-protocol frame-mAP golden tests (metrics/ava.py) against
hand-computed values of the reference evaluator semantics
(MCT/mmaction/core/evaluation/ava_utils.py + ava_evaluation/)."""

import numpy as np
import pytest

from cross_modal_video_engine_tpu.metrics.ava import (
    ava_eval, ava_frame_map, make_image_key, read_csv, read_labelmap,
    results2csv)


def test_make_image_key():
    assert make_image_key("vid", 902) == "vid,0902"
    assert make_image_key("v", 15.0) == "v,0015"


def test_frame_map_hand_computed_single_class():
    # one image, class 1: GT boxes A and B; detections in score order
    # d1 (hits A), d2 (hits A again -> FP, GT already matched),
    # d3 (hits B).  tp = [1, 0, 1]; precision sweep [1, 1/2, 2/3],
    # recall [1/2, 1/2, 1]; VOC all-points AP = .5*1 + .5*(2/3) = 5/6.
    A = [0.0, 0.0, 0.5, 0.5]      # [y1, x1, y2, x2]
    B = [0.5, 0.5, 1.0, 1.0]
    gt_boxes = {"v,0001": [A, B]}
    gt_labels = {"v,0001": [1, 1]}
    det_boxes = {"v,0001": [A, A, B]}
    det_labels = {"v,0001": [1, 1, 1]}
    det_scores = {"v,0001": [0.9, 0.8, 0.7]}
    m = ava_frame_map(gt_boxes, gt_labels, det_boxes, det_labels,
                      det_scores, class_ids=[1])
    assert m["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(5 / 6)


def test_frame_map_argmax_matching_is_not_greedy():
    # d_lo's argmax-IoU GT is the one d_hi already took -> FP, even
    # though another GT would still accept it at lower IoU
    # (per_image_evaluation.py:258-268 matches argmax only).
    g1 = [0.0, 0.0, 1.0, 1.0]
    g2 = [0.0, 0.6, 1.0, 1.6]
    d_hi = [0.0, 0.0, 1.0, 1.0]          # IoU(g1)=1
    d_lo = [0.0, 0.1, 1.0, 1.1]          # IoU(g1)=.82 > IoU(g2)=.5/1.5
    m = ava_frame_map({"k,0001": [g1, g2]}, {"k,0001": [1, 1]},
                      {"k,0001": [d_hi, d_lo]}, {"k,0001": [1, 1]},
                      {"k,0001": [0.9, 0.8]}, class_ids=[1])
    # tp=[1,0], num_gt=2 -> AP = .5
    assert m["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.5)


def test_frame_map_skips_classes_without_gt():
    box = [0.0, 0.0, 1.0, 1.0]
    m = ava_frame_map({"k,0001": [box]}, {"k,0001": [1]},
                      {"k,0001": [box, box]}, {"k,0001": [1, 2]},
                      {"k,0001": [0.9, 0.9]}, class_ids=[1, 2])
    # class 2 has no GT: excluded from the mean entirely
    assert m["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(1.0)
    assert not any(k.endswith("/2") for k in m)


def test_frame_map_accumulates_across_images():
    # class 1: image a perfect, image b one miss; pooled sweep
    box = [0.0, 0.0, 1.0, 1.0]
    off = [2.0, 2.0, 3.0, 3.0]
    m = ava_frame_map(
        {"a,0001": [box], "b,0001": [box]},
        {"a,0001": [1], "b,0001": [1]},
        {"a,0001": [box], "b,0001": [off]},
        {"a,0001": [1], "b,0001": [1]},
        {"a,0001": [0.9], "b,0001": [0.8]}, class_ids=[1])
    # tp=[1,0] over 2 GT -> AP=.5
    assert m["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.5)


def _write_label_map(path, ids):
    with open(path, "w") as f:
        for i in ids:
            f.write("item {\n")
            f.write(f'  name: "act_{i}"\n')
            f.write(f"  id: {i}\n")
            f.write("}\n")


def test_ava_eval_files_end_to_end(tmp_path):
    """results2csv + csv GT + labelmap -> ava_eval matches the in-memory
    ava_frame_map on the same data."""
    label_file = tmp_path / "labels.pbtxt"
    _write_label_map(label_file, [1, 2])

    ann = tmp_path / "gt.csv"
    ann.write_text("v1,902,0.1,0.1,0.6,0.6,1,0\n"
                   "v1,902,0.5,0.5,0.9,0.9,2,1\n"
                   "v1,903,0.2,0.2,0.7,0.7,1,0\n")

    class _DS:
        infos = [dict(video_id="v1", timestamp=902),
                 dict(video_id="v1", timestamp=903)]

        def __len__(self):
            return 2

        def __getitem__(self, i):
            return self.infos[i]

    # per-class results: label 0 -> action 1, label 1 -> action 2
    results = [
        [np.array([[0.1, 0.1, 0.6, 0.6, 0.9]]),      # act1 hit
         np.array([[0.5, 0.5, 0.9, 0.9, 0.8]])],     # act2 hit
        [np.array([[0.8, 0.8, 0.9, 0.9, 0.7]]),      # act1 miss
         np.zeros((0, 5))],
    ]
    res_file = tmp_path / "results.csv"
    results2csv(_DS(), results, str(res_file))

    out = ava_eval(str(res_file), "mAP", str(label_file), str(ann),
                   verbose=False)
    # act1: tp=[1(0.9), 0(0.7)] over 2 GT -> AP=0.5; act2: AP=1.0
    assert out["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.75)


def test_ava_eval_exclusions_and_custom_classes(tmp_path):
    label_file = tmp_path / "labels.pbtxt"
    _write_label_map(label_file, [1, 2, 3])
    ann = tmp_path / "gt.csv"
    ann.write_text("v1,902,0.1,0.1,0.6,0.6,1,0\n"
                   "v1,903,0.1,0.1,0.6,0.6,1,0\n"   # excluded below
                   "v1,902,0.5,0.5,0.9,0.9,3,1\n")  # not whitelisted
    res = tmp_path / "res.csv"
    res.write_text("v1,902,0.1,0.1,0.6,0.6,1,0.9\n"
                   "v1,903,0.1,0.1,0.6,0.6,1,0.9\n"
                   "v1,902,0.5,0.5,0.9,0.9,3,0.9\n")
    exc = tmp_path / "exc.csv"
    exc.write_text("v1,903\n")
    out = ava_eval(str(res), "mAP", str(label_file), str(ann),
                   exclude_file=str(exc), verbose=False,
                   custom_classes=[0, 1, 2])
    # only v1,902/class1 survives the whitelist+exclusion: perfect AP
    assert out["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(1.0)


def test_read_csv_sorts_by_descending_score(tmp_path):
    p = tmp_path / "r.csv"
    p.write_text("v,902,0,0,1,1,1,0.2\n"
                 "v,902,0,0,0.5,0.5,1,0.8\n")
    with open(p) as f:
        boxes, labels, scores = read_csv(f)
    assert scores["v,0902"] == [0.8, 0.2]
    assert boxes["v,0902"][0] == [0.0, 0.0, 0.5, 0.5]  # [y1,x1,y2,x2]


def test_read_labelmap(tmp_path):
    p = tmp_path / "l.pbtxt"
    p.write_text('item {\n  name: "walk"\n  id: 12\n}\n'
                 'item {\n  name: "run"\n  label_id: 79\n}\n')
    with open(p) as f:
        cats, ids = read_labelmap(f)
    assert ids == {12, 79}
    assert cats[0] == {"id": 12, "name": "walk"}
