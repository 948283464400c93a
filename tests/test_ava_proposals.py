"""AVA person-proposal generation (cli/ava_proposals): keyframe decode +
person filtering + normalized json, consumed by detection_train's
proposal_file path (the FAIR-dense-proposals flow, self-hosted)."""

import json
import os

import numpy as np

from cross_modal_video_engine_tpu.cli import ava_proposals, detection_train
from cross_modal_video_engine_tpu.data.datasets_extra import AVADataset
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
import pytest


def _fixture(tmp_path):
    vdir = tmp_path / "videos"
    vdir.mkdir()
    rows = []
    for i in range(2):
        frames = np.full((12, 32, 32, 3), 110 + 10 * i, np.uint8)
        write_test_video(str(vdir / f"v{i}.mp4"), frames, fps=10)
        rows.append(f"v{i}.mp4,0.6,0.1,0.1,0.5,0.5,{1 + i % 2},0")
    ann = tmp_path / "ann.csv"
    ann.write_text("\n".join(rows))
    return str(ann), str(vdir)


def _fake_detector(frames):
    """One person box + one non-person + one low-conf per frame."""
    H, W = frames.shape[1:3]
    det = np.array([[0.1 * W, 0.1 * H, 0.6 * W, 0.6 * H, 0.9, 0],
                    [0.2 * W, 0.2 * H, 0.4 * W, 0.4 * H, 0.95, 2],
                    [0.0, 0.0, 0.9 * W, 0.9 * H, 0.05, 0]], np.float32)
    return [det for _ in range(len(frames))]


def test_build_proposals_person_filter_and_norm(tmp_path):
    ann, vdir = _fixture(tmp_path)
    ds = AVADataset(ann, num_classes=4, data_prefix=vdir)
    props = ava_proposals.build_proposals(ds, _fake_detector, fps=10)
    assert set(props) == {"v0.mp4,0000", "v1.mp4,0000"}
    for boxes in props.values():
        assert len(boxes) == 1                 # person above conf only
        np.testing.assert_allclose(boxes[0], [0.1, 0.1, 0.6, 0.6],
                                   atol=1e-6)


@pytest.mark.full    # full lane: integration re-run of detection training; proposal building + yolo path stay default
def test_proposals_feed_detection_training(tmp_path):
    ann, vdir = _fixture(tmp_path)
    ds = AVADataset(ann, num_classes=4, data_prefix=vdir)
    props = ava_proposals.build_proposals(ds, _fake_detector, fps=10)
    pfile = tmp_path / "props.json"
    with open(pfile, "w") as f:
        json.dump(props, f)

    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(
    backbone=dict(type='SlowOnly', stage_blocks=[1, 1, 1, 1],
                  base_channels=8, conv1_kernel_t=1,
                  stage_temporal_kernels=[1, 1, 3, 3],
                  stage_spatial_strides=[1, 2, 2, 1]),
    roi_head=dict(num_classes=4, roi_size=2, sampling_ratio=1,
                  dropout=0.0),
    train_cfg=dict(pos_iou_thr=0.9, max_boxes=4),
    test_cfg=dict(action_thr=0.002))
data = dict(
    train=dict(ann_file=r'{ann}', data_prefix=r'{vdir}',
               proposal_file=r'{pfile}'),
    val=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    fps=10, timestamp_start=0,
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleAVAFrames', clip_len=2, frame_interval=2,
             test_mode=True),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Normalize', mean=[127.5]*3, std=[127.5]*3),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=2)
optimizer = dict(optimizer='adamw', learning_rate=2e-3, grad_clip=1.0)
total_epochs = 2
eval_interval = 2
""")
    history = detection_train.main([cfg and str(cfg), "--work_dir",
                                    str(tmp_path / "w")])
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)


@pytest.mark.full    # full lane: detector-glue variant; the detection CLI e2e (precomputed proposals) and the yolo detect tests stay default
def test_yolo_detector_path_runs(tmp_path):
    """Real YoloV5 detector plumbing (random tiny weights): checkpoint ->
    jitted detect -> pixel-coord rows."""
    import jax
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.models.yolo import YoloConfig, YoloV5
    from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint

    cfg = YoloConfig(depth_multiple=0.33, width_multiple=0.125,
                     num_classes=3)
    model = YoloV5(cfg)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    ck = str(tmp_path / "yolo_ck")
    save_checkpoint(ck, variables, cfg)

    det_fn = ava_proposals.make_yolo_detector(ck, img_size=64, conf=0.0)
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 48, 40, 3), dtype=np.uint8)
    dets = det_fn(frames)
    assert len(dets) == 2
    for d in dets:
        if len(d):
            assert d.shape[1] == 6
            # boxes rescaled to the ORIGINAL 40x48 frame
            assert float(np.nanmax(d[:, 0])) <= 40.0 * 1.5
