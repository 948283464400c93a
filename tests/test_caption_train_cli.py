"""Caption (Relseq) training CLI end-to-end on a tiny fixture
(cli/caption_train.py — the seq_generate tools/train.py role)."""

import pytest
import os

import numpy as np

from cross_modal_video_engine_tpu.cli import caption_test, caption_train
from cross_modal_video_engine_tpu.io.video_decode import write_test_video

rng = np.random.default_rng(77)


def _fixture(tmp_path, n=6):
    vdir = tmp_path / "videos"
    vdir.mkdir()
    lines = []
    for i in range(n):
        # brightness encodes which label sequence applies
        cls = i % 2
        base = 40 if cls == 0 else 215
        frames = np.clip(base + rng.integers(-20, 20, (10, 32, 32, 3)),
                         0, 255).astype(np.uint8)
        write_test_video(str(vdir / f"v{i}.mp4"), frames)
        seq = "1->2" if cls == 0 else "3->4"
        lines.append(f"v{i}.mp4 {seq}")
    ann = tmp_path / "ann_relseq.txt"
    ann.write_text("\n".join(lines))

    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(
    backbone=dict(num_frames=4, img_size=16, patch_size=8, embed_dims=16,
                  num_heads=2, num_layers=1, drop_path_max=0.0),
    decoder=dict(num_classes=6, in_channels=16, max_len=3,
                 input_dropout_p=0.0))
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
total_epochs = 6
eval_interval = 2
""")
    return str(cfg)


def test_caption_train_cli(tmp_path):
    cfg = _fixture(tmp_path)
    work = str(tmp_path / "work")
    history = caption_train.main([cfg, "--work_dir", work])
    assert len(history) == 6
    # loss trends down over training
    assert history[-1]["loss"] < history[0]["loss"]
    assert "seq_mAP" in history[-1]

    best = [f for f in os.listdir(work) if f.startswith("model_best")]
    assert best

    # the produced checkpoint drives the caption test CLI end-to-end
    report = caption_test.main([
        cfg, "--checkpoint", os.path.join(work, best[0])])
    assert 0.0 <= report["seq_mAP"] <= 1.0

    # resume continues from the last epoch
    history2 = caption_train.main([cfg, "--work_dir", work, "--resume",
                                   "--total_epochs", "7"])
    assert [h["epoch"] for h in history2] == [6]


@pytest.mark.full    # full lane: backbone variant; the per-frame consensus mechanism trains default via test_recognition_cli per_frame_backbone_trains_via_tsn_consensus
def test_caption_train_per_frame_backbone(tmp_path):
    """Per-frame (B, T, C) caption backbone (configs/seq_generate/
    tsm_relseq.py family): the trainer's temporal-mean adapter pools
    TSM frame features to the (B, C) decoder input, loss decreases,
    and the checkpoint round-trips through caption_test."""
    cfg = _fixture(tmp_path)
    with open(cfg) as f:
        body = f.read()
    body = body.replace(
        "backbone=dict(num_frames=4, img_size=16, patch_size=8, "
        "embed_dims=16,\n                  num_heads=2, num_layers=1, "
        "drop_path_max=0.0),",
        "backbone=dict(type='TSM', stage_blocks=[1, 1],\n"
        "                  base_channels=4, shift_div=2),")
    body = body.replace("in_channels=16", "in_channels=32")
    cfg2 = str(tmp_path / "config_tsm.py")
    with open(cfg2, "w") as f:
        f.write(body)
    work = str(tmp_path / "work_tsm")
    history = caption_train.main([cfg2, "--work_dir", work,
                                  "--total_epochs", "4"])
    assert len(history) == 4
    assert history[-1]["loss"] < history[0]["loss"]
    best = [f for f in os.listdir(work) if f.startswith("model_best")]
    assert best
    report = caption_test.main([cfg2, "--checkpoint",
                                os.path.join(work, best[0])])
    assert 0.0 <= report["seq_mAP"] <= 1.0


@pytest.mark.full    # full lane: backbone variant; test_caption_train_cli is the default caption-train sentinel and the conv-pooled path trains default via test_recognition_cli conv_backbone
def test_caption_train_conv_backbone(tmp_path):
    """Non-TimeSformer caption training (the reference seq_generate
    family spans i3d/slowfast/x3d/... backbones): SlowOnly backbone ->
    RNN decoder trains and the checkpoint round-trips through
    init_recognizer/caption_test."""
    cfg = _fixture(tmp_path)
    with open(cfg) as f:
        body = f.read()
    body = body.replace(
        "backbone=dict(num_frames=4, img_size=16, patch_size=8, "
        "embed_dims=16,\n                  num_heads=2, num_layers=1, "
        "drop_path_max=0.0),",
        "backbone=dict(type='ResNet3D', stage_blocks=[1, 1, 1, 1],\n"
        "                  base_channels=4),")
    body = body.replace("in_channels=16", "in_channels=128")
    cfg2 = str(tmp_path / "config_conv.py")
    with open(cfg2, "w") as f:
        f.write(body)
    work = str(tmp_path / "work_conv")
    history = caption_train.main([cfg2, "--work_dir", work,
                                  "--total_epochs", "2"])
    assert len(history) == 2 and np.isfinite(history[-1]["loss"])
    best = [f for f in os.listdir(work) if f.startswith("model_best")]
    assert best
    report = caption_test.main([cfg2, "--checkpoint",
                                os.path.join(work, best[0])])
    assert 0.0 <= report["seq_mAP"] <= 1.0
