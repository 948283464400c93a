"""Geometry/behavior tests for the YOLOv5 augmentation pipeline
(data/yolo_aug.py — the MCT/yolov5/utils/augmentations.py +
dataloaders.py mosaic path)."""

import numpy as np
import pytest

from cross_modal_video_engine_tpu.data.yolo_aug import (
    YoloAugHyp, augment_hsv, augment_sample, box_candidates,
    load_image_resized, mixup, mosaic4, random_perspective, xywhn2xyxy,
    xyxy2xywhn)


def test_coord_roundtrip():
    rng = np.random.RandomState(0)
    xywh = np.stack([rng.uniform(0.3, 0.7, 8), rng.uniform(0.3, 0.7, 8),
                     rng.uniform(0.05, 0.25, 8),
                     rng.uniform(0.05, 0.25, 8)], 1)
    xyxy = xywhn2xyxy(xywh, 64, 48)
    back = xyxy2xywhn(xyxy, 64, 48, clip=False)
    np.testing.assert_allclose(back, xywh, atol=1e-9)


def test_xyxy2xywhn_clips_to_edges():
    xyxy = np.array([[-5.0, -5.0, 70.0, 70.0]])
    out = xyxy2xywhn(xyxy, 64, 64)
    assert 0.0 < out[0, 0] < 1.0
    assert out[0, 2] <= 1.0 and out[0, 3] <= 1.0


def test_augment_hsv_identity_and_jitter():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    same = augment_hsv(img, rng, 0.0, 0.0, 0.0)
    np.testing.assert_array_equal(same, img)
    jit = augment_hsv(img, np.random.RandomState(1), 0.015, 0.7, 0.4)
    assert jit.shape == img.shape and jit.dtype == np.uint8
    assert not np.array_equal(jit, img)


def test_random_perspective_identity():
    rng = np.random.RandomState(0)
    img = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    boxes = np.array([[0, 10.0, 12.0, 40.0, 44.0],
                      [1, 30.0, 5.0, 60.0, 25.0]])
    out, tgt = random_perspective(img, boxes.copy(), rng, degrees=0,
                                  translate=0.0, scale=0.0, shear=0)
    np.testing.assert_array_equal(out, img)
    np.testing.assert_allclose(tgt, boxes, atol=1e-6)


def test_random_perspective_scale_moves_boxes():
    rng = np.random.RandomState(3)
    img = np.full((64, 64, 3), 200, np.uint8)
    img[20:40, 20:40] = 50
    boxes = np.array([[0, 20.0, 20.0, 40.0, 40.0]])
    out, tgt = random_perspective(img, boxes.copy(), rng, degrees=10,
                                  translate=0.1, scale=0.3, shear=5)
    assert out.shape == (64, 64, 3)
    if len(tgt):          # box survived the candidate filter
        assert (tgt[:, 1:] >= 0).all() and (tgt[:, 1:] <= 64).all()


def test_box_candidates_filters_degenerate():
    before = np.array([[0, 0, 20, 20]], float).T
    after_ok = np.array([[0, 0, 18, 18]], float).T
    after_thin = np.array([[0, 0, 1.0, 18]], float).T
    assert box_candidates(before, after_ok)[0]
    assert not box_candidates(before, after_thin)[0]


def test_mosaic4_canvas_and_labels():
    rng = np.random.RandomState(0)
    s = 32
    items = []
    for v in (60, 120, 180, 240):
        img = np.full((s, s, 3), v, np.uint8)
        lab = np.array([[v % 2, 0.5, 0.5, 0.5, 0.5]], np.float32)
        items.append((img, lab))
    canvas, labels = mosaic4(items, s, rng)
    assert canvas.shape == (2 * s, 2 * s, 3)
    # all four tile values present somewhere
    present = set(np.unique(canvas))
    assert {60, 120, 180, 240} <= present
    assert 1 <= len(labels) <= 4
    assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 2 * s).all()
    # labels are [cls, x1, y1, x2, y2] with x2>x1, y2>y1
    assert (labels[:, 3] > labels[:, 1]).all()
    assert (labels[:, 4] > labels[:, 2]).all()


def test_mixup_blends_and_concats():
    rng = np.random.RandomState(0)
    a = np.zeros((16, 16, 3), np.uint8)
    b = np.full((16, 16, 3), 200, np.uint8)
    la = np.array([[0, 1.0, 1.0, 5.0, 5.0]])
    lb = np.array([[1, 2.0, 2.0, 6.0, 6.0]])
    out, labels = mixup(a, la, b, lb, rng)
    assert labels.shape == (2, 5)
    m = out.mean()
    assert 40 < m < 160       # beta(32,32) concentrates near 0.5


def test_load_image_resized_long_side():
    img = np.zeros((30, 60, 3), np.uint8)
    out = load_image_resized(img, 64)
    assert max(out.shape[:2]) == 64
    assert out.shape[1] == 64 and out.shape[0] == 32


@pytest.mark.parametrize("mosaic", [0.0, 1.0])
def test_augment_sample_end_to_end(mosaic):
    rng = np.random.RandomState(0)
    imgs = []
    for i in range(4):
        im = np.random.RandomState(i).randint(
            0, 255, (48, 64, 3)).astype(np.uint8)
        lab = np.array([[i % 2, 0.5, 0.5, 0.4, 0.4]], np.float32)
        imgs.append((im, lab))
    hyp = YoloAugHyp(mosaic=mosaic, mixup=0.5 if mosaic else 0.0)
    img, labels = augment_sample(lambda j: imgs[j], 0, 4, 64, hyp, rng)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert labels.ndim == 2 and labels.shape[1] == 5
    if len(labels):
        assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()
        assert set(np.unique(labels[:, 0])) <= {0.0, 1.0}


def _diamond(cx, cy, r):
    return np.array([[cx, cy - r], [cx + r, cy], [cx, cy + r],
                     [cx - r, cy]], np.float32)


def test_resample_segments_preserves_extent():
    from cross_modal_video_engine_tpu.data.yolo_aug import (
        resample_segments, segment2box)
    poly = _diamond(0.5, 0.5, 0.3)
    (res,) = resample_segments([poly], n=400)
    assert res.shape == (400, 2)
    box = segment2box(res, 1.0, 1.0)
    np.testing.assert_allclose(box, [0.2, 0.2, 0.8, 0.8], atol=5e-3)


def test_random_perspective_seg_box_follows_polygon():
    """Under a pure-scale warp the re-derived box comes from the
    polygon (diamond), not its corner bbox — the segment branch of
    random_perspective (utils/segment/augmentations.py)."""
    from cross_modal_video_engine_tpu.data.yolo_aug import (
        random_perspective_seg)
    rng = np.random.RandomState(3)
    img = np.zeros((64, 64, 3), np.uint8)
    poly = _diamond(32, 32, 16)
    targets = np.array([[0, 16, 16, 48, 48]], np.float64)
    out, new_t, new_s = random_perspective_seg(
        img, targets, [poly], rng, degrees=0, translate=0.0,
        scale=0.0, shear=0)
    assert len(new_t) == 1 and len(new_s) == 1
    # identity warp: box returns to the polygon extent
    np.testing.assert_allclose(new_t[0, 1:], [16, 16, 48, 48], atol=0.5)


@pytest.mark.parametrize("mosaic", [0.0, 1.0])
def test_augment_seg_sample_mask_box_consistency(mosaic):
    """Full segment pipeline: every surviving label's polygon extent
    (clipped to the image) matches its box after normalization."""
    from cross_modal_video_engine_tpu.data.yolo_aug import (
        augment_seg_sample)
    rng = np.random.RandomState(0)
    items = []
    for i in range(4):
        im = np.random.RandomState(i).randint(
            0, 255, (48, 64, 3)).astype(np.uint8)
        items.append((im, [(float(i % 2), _diamond(0.5, 0.5, 0.2))]))
    hyp = YoloAugHyp(mosaic=mosaic, mixup=0.5 if mosaic else 0.0)
    img, labels, segs = augment_seg_sample(
        lambda j: items[j], 0, 4, 64, hyp, rng)
    assert img.shape == (64, 64, 3)
    assert len(labels) == len(segs)
    for lab, seg in zip(labels, segs):
        x = seg[:, 0].clip(0, 64)
        y = seg[:, 1].clip(0, 64)
        cx, cy = (x.min() + x.max()) / 128, (y.min() + y.max()) / 128
        # box center tracks the polygon extent (clip tolerance: the
        # warped box was derived pre-flip from inside-image points)
        assert abs(cx - lab[1]) < 0.08 and abs(cy - lab[2]) < 0.08


def test_copy_paste_appends_mirrored_instance():
    from cross_modal_video_engine_tpu.data.yolo_aug import copy_paste
    rng = np.random.RandomState(0)
    img = np.zeros((64, 64, 3), np.uint8)
    img[10:30, 5:25] = 200        # instance pixels on the left
    labels = np.array([[2.0, 5, 10, 25, 30]])
    segs = [np.array([[5, 10], [25, 10], [25, 30], [5, 30]], np.float64)]
    out, new_labels, new_segs = copy_paste(img, labels, segs, 1.0, rng)
    assert len(new_labels) == 2 and len(new_segs) == 2
    # mirrored box: x -> w - x
    np.testing.assert_allclose(new_labels[1], [2.0, 39, 10, 59, 30])
    assert out[15, 50, 0] == 200  # pasted pixels live on the right
    assert img[15, 50, 0] == 0    # input untouched (copy semantics)


def test_copy_paste_skips_occluding_paste():
    from cross_modal_video_engine_tpu.data.yolo_aug import copy_paste
    rng = np.random.RandomState(0)
    img = np.zeros((64, 64, 3), np.uint8)
    # centered box mirrors onto itself -> IoA 1.0 -> rejected
    labels = np.array([[0.0, 22, 22, 42, 42]])
    segs = [np.array([[22, 22], [42, 22], [42, 42], [22, 42]], np.float64)]
    _, new_labels, new_segs = copy_paste(img, labels, segs, 1.0, rng)
    assert len(new_labels) == 1 and len(new_segs) == 1
