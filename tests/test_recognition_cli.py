"""Recognition train/test CLI end-to-end on a tiny fixture."""

import pytest
import json
import os

import numpy as np

from cross_modal_video_engine_tpu.cli import recognition_test, recognition_train
from cross_modal_video_engine_tpu.io.video_decode import write_test_video

rng = np.random.default_rng(441)


def _fixture(tmp_path, n=6):
    vdir = tmp_path / "videos"
    vdir.mkdir()
    lines = []
    for i in range(n):
        label = i % 2
        # brightness encodes the class so training can learn
        base = 40 if label == 0 else 215
        frames = np.clip(base + rng.integers(-20, 20, (12, 32, 32, 3)),
                         0, 255).astype(np.uint8)
        write_test_video(str(vdir / f"v{i}.mp4"), frames)
        lines.append(f"v{i}.mp4 {label}")
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(lines))

    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(
    backbone=dict(num_frames=4, img_size=16, patch_size=8, embed_dims=16,
                  num_heads=2, num_layers=1, drop_path_max=0.0),
    num_classes=2)
data = dict(
    train=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    val=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=4, frame_interval=2,
             num_clips=1, test_mode=True),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(16, 16), keep_ratio=False),
        dict(type='Normalize', mean=[127.5]*3, std=[127.5]*3),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=6)
optimizer = dict(optimizer='adamw', learning_rate=3e-3, grad_clip=1.0)
total_epochs = 8
eval_interval = 2
""")
    return str(cfg)


def test_recognition_train_and_test_cli(tmp_path):
    cfg = _fixture(tmp_path)
    work = str(tmp_path / "work")
    history = recognition_train.main([cfg, "--work_dir", work])
    assert len(history) == 8
    # learned the brightness rule
    assert history[-1]["train_top1"] >= 0.8
    best = os.path.join(work, "model_best")
    assert os.path.exists(best)

    report = recognition_test.main([
        cfg, "--checkpoint", best,
        "--out", str(tmp_path / "scores.npz")])
    assert report["top1_acc"] >= 0.8
    assert "mean_class_accuracy" in report
    saved = np.load(str(tmp_path / "scores.npz"))
    assert saved["scores"].shape == (6, 2)

    # resume from latest epoch
    history2 = recognition_train.main([cfg, "--work_dir", work,
                                       "--resume", "--total_epochs", "9"])
    assert [h["epoch"] for h in history2] == [8]


def test_train_with_blending_config(tmp_path):
    """train_cfg.blending routes through make_blending into the train
    step (mmaction train_cfg contract)."""
    cfg = _fixture(tmp_path)
    with open(cfg, "a") as f:
        f.write("\ntrain_cfg = dict(blending=dict(type='MixupBlending',"
                " alpha=0.2))\n")
    work = str(tmp_path / "work_blend")
    history = recognition_train.main(
        [cfg, "--work_dir", work, "--total_epochs", "2"])
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])


def test_recognition_train_conv_backbone(tmp_path):
    """BatchNorm backbones train through the stats-aware step (the same
    path mmaction's ResNet3d configs exercise)."""
    cfg = _fixture(tmp_path)
    with open(cfg) as f:
        body = f.read()
    body = body.replace(
        "backbone=dict(num_frames=4, img_size=16, patch_size=8, "
        "embed_dims=16,\n                  num_heads=2, num_layers=1, "
        "drop_path_max=0.0),",
        "backbone=dict(type='ResNet3D', stage_blocks=[1, 1, 1, 1],\n"
        "                  base_channels=4),")
    cfg2 = str(tmp_path / "config_conv.py")
    with open(cfg2, "w") as f:
        f.write(body)
    work = str(tmp_path / "work_conv")
    history = recognition_train.main([cfg2, "--work_dir", work,
                                      "--total_epochs", "2"])
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])
    assert "top1_acc" in history[-1]
    # best checkpoint carries batch_stats for eval-mode BN
    import os as _os
    best = [f for f in _os.listdir(work) if f.startswith("model_best")]
    assert best
    from cross_modal_video_engine_tpu.train.checkpoint import load_checkpoint
    variables, _cfg, _meta = load_checkpoint(_os.path.join(work, best[0]))
    assert "batch_stats" in variables


@pytest.mark.full    # full lane: neck variant of the default train sentinels; TPN module math stays default in test_tpn.py
def test_tpn_recipe_trains(tmp_path):
    """model.neck=dict(type='TPN') routes backbone stages through the
    TPN neck; the auxiliary CE joins the loss and training converges on
    the brightness fixture (the configs/recognition/tpn family)."""
    cfg_path = _fixture(tmp_path)
    cfg = tmp_path / "config_tpn.py"
    cfg.write_text(f"""
_base_ = ['{os.path.basename(cfg_path)}']
model = dict(
    backbone=dict(_delete_=True, type='ResNet3D',
                  stage_blocks=[1, 1, 1, 1], base_channels=8,
                  conv1_kernel_t=1,
                  stage_temporal_kernels=[1, 1, 3, 3]),
    neck=dict(type='TPN', in_channels=[32, 64], out_channels=16,
              mid_channels=16, lf_out_channels=16, fusion_channels=16,
              downsample_scales=[1, 1], groups=4))
optimizer = dict(optimizer='adamw', learning_rate=3e-3, grad_clip=1.0)
total_epochs = 6
eval_interval = 6
""")
    history = recognition_train.main([str(cfg), "--work_dir",
                                      str(tmp_path / "wtpn")])
    assert len(history) == 6
    losses = [h["loss"] for h in history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert "top1_acc" in history[-1]


def test_per_frame_backbone_trains_via_tsn_consensus(tmp_path):
    """Per-frame backbones (TSM family) pair with Recognizer2D +
    TSNHead consensus through the config path — scores come out
    (B, num_classes), and training converges on the brightness rule."""
    cfg_path = _fixture(tmp_path)
    cfg = tmp_path / "config_tsm.py"
    cfg.write_text(f"""
_base_ = ['{os.path.basename(cfg_path)}']
model = dict(
    backbone=dict(_delete_=True, type='TSM',
                  stage_blocks=[1, 1, 1, 1], base_channels=8,
                  shift_div=4))
optimizer = dict(optimizer='adamw', learning_rate=3e-3, grad_clip=1.0)
total_epochs = 6
eval_interval = 6
""")
    history = recognition_train.main([str(cfg), "--work_dir",
                                      str(tmp_path / "wtsm")])
    losses = [h["loss"] for h in history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert 0.0 <= history[-1]["top1_acc"] <= 1.0
