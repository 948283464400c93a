"""OmniSource runner: alternating-source training with per-source logs."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.recognizer import BackboneClassifier
from cross_modal_video_engine_tpu.models.resnet3d import (ResNet3D,
                                                          ResNet3DConfig)
from cross_modal_video_engine_tpu.train.recognition_trainer import (
    RecognitionTrainConfig, train_omnisource)

rng = np.random.default_rng(613)


def _source(n, noise, seed, T=4, R=8):
    labels = (np.arange(n) % 2).astype(np.int32)
    r = np.random.default_rng(seed)
    clips = np.where(labels[:, None, None, None, None] == 0, -0.7, 0.7)
    clips = (clips + noise * r.standard_normal((n, T, R, R, 3))
             ).astype(np.float32)
    return clips, labels


def test_omnisource_trains_both_sources():
    cfg = ResNet3DConfig(stage_blocks=(1,), base_channels=8,
                         stage_temporal_kernels=(1,))
    model = BackboneClassifier(ResNet3D(cfg), num_classes=2)

    main_clips, main_labels = _source(8, 0.1, 0)
    aux_clips, aux_labels = _source(4, 0.4, 1)

    def main_batches(epoch):
        for i in range(0, 8, 4):
            yield main_clips[i:i + 4], main_labels[i:i + 4]

    aux_calls = {"n": 0}

    def aux_source():
        aux_calls["n"] += 1
        for i in range(0, 4, 4):
            yield aux_clips[i:i + 4], aux_labels[i:i + 4]

    variables = model.init(jax.random.key(0),
                           jnp.asarray(main_clips[:1]))
    tcfg = RecognitionTrainConfig(optimizer="adamw", learning_rate=5e-3,
                                  grad_clip=1.0)
    state, history = train_omnisource(
        model, variables, tcfg, main_batches, [aux_source],
        train_ratio=(2, 1), total_epochs=6)

    assert len(history) == 6
    # per-source losses logged with the /auxN suffix
    assert "loss" in history[0] and "loss/aux0" in history[0]
    losses = [h["loss"] for h in history]
    aux_losses = [h["loss/aux0"] for h in history]
    assert np.isfinite(losses + aux_losses).all()
    assert losses[-1] < losses[0]
    assert aux_losses[-1] < aux_losses[0]
    # train_ratio=(2,1): aux fires on every 2nd main step -> 1/epoch;
    # the 1-batch aux source was cycled (re-created) across epochs
    assert aux_calls["n"] >= 5


def test_omnisource_config_cli(tmp_path):
    """The `omnisource = dict(...)` config block routes the recognition
    train CLI through train_omnisource (reference configs/recognition/
    omnisource/* `omnisource = True` + apis/train.py train_ratio)."""
    from cross_modal_video_engine_tpu.cli import recognition_train
    from cross_modal_video_engine_tpu.io.video_decode import write_test_video

    r = np.random.default_rng(991)

    def make_split(name, n):
        vdir = tmp_path / name
        vdir.mkdir()
        lines = []
        for i in range(n):
            label = i % 2
            base = 40 if label == 0 else 215
            frames = np.clip(base + r.integers(-20, 20, (8, 32, 32, 3)),
                             0, 255).astype(np.uint8)
            write_test_video(str(vdir / f"v{i}.mp4"), frames)
            lines.append(f"v{i}.mp4 {label}")
        ann = tmp_path / f"{name}.txt"
        ann.write_text("\n".join(lines))
        return ann, vdir

    main_ann, main_dir = make_split("main", 6)
    aux_ann, aux_dir = make_split("aux", 4)

    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(
    backbone=dict(type='TSN', stage_blocks=[1, 1], base_channels=4),
    num_classes=2)
data = dict(
    train=dict(ann_file=r'{main_ann}', data_prefix=r'{main_dir}'),
    val=dict(ann_file=r'{main_ann}', data_prefix=r'{main_dir}'),
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=4, frame_interval=2,
             num_clips=1, test_mode=True),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(16, 16), keep_ratio=False),
        dict(type='Normalize', mean=[127.5]*3, std=[127.5]*3),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=3)
omnisource = dict(
    train_ratio=[2, 1],
    aux=[dict(ann_file=r'{aux_ann}', data_prefix=r'{aux_dir}')])
optimizer = dict(optimizer='adamw', learning_rate=3e-3, grad_clip=1.0)
total_epochs = 3
eval_interval = 1
""")
    work = str(tmp_path / "work")
    history = recognition_train.main([str(cfg), "--work_dir", work])
    assert len(history) == 3
    # both sources stepped and logged
    assert "loss" in history[0] and "loss/aux0" in history[0]
    assert np.isfinite([h["loss"] for h in history]).all()
    ck = os.path.join(work, "omnisource_final")
    assert os.path.exists(ck)
