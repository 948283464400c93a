"""AVA detection training end-to-end on a tiny synthetic fixture:
config-driven CLI (cli/detection_train), loss decreases, AVA-protocol
frame-mAP evaluation runs, and resume restores batch_stats."""

import pytest
import os

import numpy as np

from cross_modal_video_engine_tpu.cli import detection_train
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.train.detection_trainer import (
    assign_proposals, pack_detection_batch)

rng = np.random.default_rng(7)


def _fixture(tmp_path, n_videos=4):
    """Videos whose keyframe box holds a bright (action 1) or dark
    (action 2) patch; boxes at known normalized coords."""
    vdir = tmp_path / "videos"
    vdir.mkdir()
    rows = []
    for i in range(n_videos):
        action = 1 + (i % 2)
        frames = np.full((12, 32, 32, 3), 128, np.uint8)
        lum = 230 if action == 1 else 20
        # box occupies the upper-left quadrant
        frames[:, 2:14, 2:14] = lum
        frames = np.clip(frames + rng.integers(-8, 8, frames.shape),
                         0, 255).astype(np.uint8)
        write_test_video(str(vdir / f"v{i}.mp4"), frames, fps=10)
        # keyframe at t=0.6s (frame 6 of 12 at 10 fps)
        rows.append(f"v{i}.mp4,0.6,0.0625,0.0625,0.4375,0.4375,{action},0")
    ann = tmp_path / "ann.csv"
    ann.write_text("\n".join(rows))

    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(
    backbone=dict(type='SlowOnly', stage_blocks=[1, 1, 1, 1],
                  base_channels=8, conv1_kernel_t=1,
                  stage_temporal_kernels=[1, 1, 3, 3],
                  stage_spatial_strides=[1, 2, 2, 1]),
    roi_head=dict(num_classes=4, roi_size=2, sampling_ratio=1,
                  dropout=0.0),
    train_cfg=dict(pos_iou_thr=0.9, max_boxes=2),
    test_cfg=dict(action_thr=0.002))
data = dict(
    train=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    val=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    fps=10, timestamp_start=0,
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleAVAFrames', clip_len=4, frame_interval=2,
             test_mode=True),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Normalize', mean=[127.5]*3, std=[127.5]*3),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=4)
optimizer = dict(optimizer='adamw', learning_rate=2e-3, grad_clip=1.0)
total_epochs = 8
eval_interval = 4
""")
    return str(cfg)


def test_detection_train_cli_e2e(tmp_path):
    cfg = _fixture(tmp_path)
    work = str(tmp_path / "work")
    history = detection_train.main([cfg, "--work_dir", work])
    assert len(history) == 8
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0] * 0.8, losses
    # AVA-protocol eval ran and returned a finite frame-mAP
    evals = [h for h in history if "mAP@0.5IOU" in h]
    assert evals, history
    assert 0.0 <= evals[-1]["mAP@0.5IOU"] <= 1.0
    # boxes are separable by brightness: the trained model should rank
    # the true action first on its own train set
    assert evals[-1]["mAP@0.5IOU"] > 0.9, evals

    # resume continues from the saved epoch with warm batch_stats
    history2 = detection_train.main([cfg, "--work_dir", work, "--resume",
                                     "--total_epochs", "10"])
    assert [h["epoch"] for h in history2] == [8, 9]


def test_detection_test_cli_offline_eval(tmp_path):
    """Train briefly, then score offline through cli/detection_test:
    results.csv in the AVA format + file-level ava_eval frame-mAP."""
    from cross_modal_video_engine_tpu.cli import detection_test

    cfg = _fixture(tmp_path)
    work = str(tmp_path / "work")
    detection_train.main([cfg, "--work_dir", work, "--total_epochs", "4"])

    labels = tmp_path / "labels.pbtxt"
    labels.write_text("item {\n  name: \"act1\"\n  id: 1\n}\n"
                      "item {\n  name: \"act2\"\n  id: 2\n}\n"
                      "item {\n  name: \"act3\"\n  id: 3\n}\n")
    out_csv = str(tmp_path / "results.csv")
    import glob
    best = glob.glob(os.path.join(work, "model_best"))[0]
    report = detection_test.main([cfg, "--checkpoint", best,
                                  "--out", out_csv,
                                  "--label_file", str(labels)])
    assert os.path.exists(out_csv)
    rows = [l.split(",") for l in open(out_csv).read().splitlines() if l]
    assert all(len(r) == 8 for r in rows)          # AVA result format
    assert "PascalBoxes_Precision/mAP@0.5IOU" in report
    assert 0.0 <= report["PascalBoxes_Precision/mAP@0.5IOU"] <= 1.0


def test_assign_proposals_semantics():
    gt = np.array([[0.1, 0.1, 0.5, 0.5]], np.float32)
    gl = np.zeros((1, 4), np.float32)
    gl[0, 2] = 1.0
    props = np.array([[0.1, 0.1, 0.5, 0.5],     # IoU 1 -> positive
                      [0.6, 0.6, 0.9, 0.9]],    # IoU 0 -> background
                     np.float32)
    boxes, labels = assign_proposals(props, gt, gl, 4, pos_iou_thr=0.9)
    # gt prepended (add_gt_as_proposals), then the two proposals
    assert boxes.shape == (3, 4)
    np.testing.assert_allclose(labels[0], gl[0])   # the GT row
    np.testing.assert_allclose(labels[1], gl[0])   # matched proposal
    np.testing.assert_allclose(labels[2], 0.0)     # background


def test_pack_detection_batch_static_layout():
    items = [dict(clip=np.zeros((2, 8, 8, 3)),
                  boxes=np.array([[0, 0, 1, 1]], np.float32),
                  labels=np.eye(3, dtype=np.float32)[:1]),
             dict(clip=np.zeros((2, 8, 8, 3)),
                  boxes=np.zeros((0, 4), np.float32),
                  labels=np.zeros((0, 3), np.float32))]
    clips, rois, labels, valid = pack_detection_batch(items, 2, 3)
    assert clips.shape == (2, 2, 8, 8, 3)
    assert rois.shape == (4, 5) and labels.shape == (4, 3)
    np.testing.assert_allclose(valid, [1, 0, 0, 0])
    assert rois[0, 0] == 0                          # batch index


@pytest.mark.full    # full lane: backbone variant; the slowonly detection CLI e2e keeps the trainer default
def test_slowfast_detection_backbone(tmp_path):
    """Dual-pathway SlowFast drives the AVA RoI head: return_stages
    temporal-pools each pathway and concats channels
    (SingleRoIExtractor3D with_temporal_pool semantics); the recipe
    swaps the backbone via mmcv-style _delete_ inheritance."""
    base_cfg = _fixture(tmp_path)
    cfg = tmp_path / "config_sf.py"
    cfg.write_text(f"""
_base_ = ['{os.path.basename(base_cfg)}']
model = dict(
    backbone=dict(_delete_=True, type='SlowFast',
                  depth_blocks=[1, 1, 1, 1], alpha=2, beta_inv=8,
                  base_channels=8))
""")
    history = detection_train.main([str(cfg), "--work_dir",
                                    str(tmp_path / "wsf"),
                                    "--total_epochs", "2"])
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)


def test_config_delete_replaces_base_dict(tmp_path):
    """mmcv `_delete_=True` semantics in _base_ inheritance."""
    from cross_modal_video_engine_tpu.config import Config
    base = tmp_path / "base.py"
    base.write_text("model = dict(backbone=dict(type='A', depth=50, "
                    "extra=1))\n")
    child = tmp_path / "child.py"
    child.write_text(f"_base_ = ['{base.name}']\n"
                     "model = dict(backbone=dict(_delete_=True, "
                     "type='B', width=8))\n")
    cfg = Config.fromfile(str(child))
    bb = cfg["model.backbone"]
    assert bb == {"type": "B", "width": 8}       # base keys dropped


def test_flip_mirrors_detection_boxes(tmp_path):
    """A Flip op in the detection pipeline mirrors gt boxes (and any
    proposals) in sync with the frames."""
    from cross_modal_video_engine_tpu.cli.detection_train import det_batches
    from cross_modal_video_engine_tpu.data.datasets_extra import AVADataset
    from cross_modal_video_engine_tpu.data.pipelines import build_pipeline

    vdir = tmp_path / "videos"
    vdir.mkdir()
    frames = np.full((8, 16, 16, 3), 100, np.uint8)
    write_test_video(str(vdir / "v.mp4"), frames, fps=10)
    ann = tmp_path / "ann.csv"
    ann.write_text("v.mp4,0.4,0.1,0.2,0.5,0.6,1,0\n")
    ds = AVADataset(str(ann), num_classes=3, data_prefix=str(vdir))

    pipe = build_pipeline([
        dict(type="DecordInit"),
        dict(type="SampleAVAFrames", clip_len=2, frame_interval=2,
             test_mode=True),
        dict(type="DecordDecode"),
        dict(type="Flip", flip_ratio=1.0),
        dict(type="Normalize", mean=[127.5] * 3, std=[127.5] * 3),
        dict(type="FormatShape", input_format="NTHWC"),
    ])
    batch = next(det_batches(ds, pipe, 1, 3, 2, fps=10, ts_start=0,
                             include_meta=True))
    # original (0.1, 0.2, 0.5, 0.6) -> mirrored x: (0.5, 0.2, 0.9, 0.6)
    np.testing.assert_allclose(batch["rois"][0, 1:],
                               [0.5, 0.2, 0.9, 0.6], atol=1e-6)
    np.testing.assert_allclose(np.asarray(batch["gt_boxes"][0])[0],
                               [0.5, 0.2, 0.9, 0.6], atol=1e-6)


def test_random_crop_adjusts_normalized_boxes(tmp_path):
    """RandomCrop in a detection pipeline transforms the normalized
    boxes into the crop's coordinate frame."""
    from cross_modal_video_engine_tpu.data.pipelines_extra import RandomCrop

    imgs = [np.zeros((16, 16, 3), np.uint8)] * 2
    op = RandomCrop(size=8, seed=3)
    # pin the crop origin by monkeypatching the rng
    op.rng = np.random.default_rng(0)
    results = {"imgs": list(imgs), "img_shape": (16, 16),
               "gt_bboxes": np.array([[0.25, 0.25, 0.75, 0.75]],
                                     np.float32),
               "bbox_coords": "normalized"}
    out = op(results)
    x0, y0 = out["crop_bbox"][0], out["crop_bbox"][1]
    b = out["gt_bboxes"][0]
    # expected: (norm - x0/16) * 16/8, clipped
    exp = np.clip((np.array([0.25, 0.25, 0.75, 0.75])
                   - np.array([x0, y0, x0, y0]) / 16.0) * 2.0, 0, 1)
    np.testing.assert_allclose(b, exp, atol=1e-6)
    assert out["imgs"][0].shape == (8, 8, 3)
