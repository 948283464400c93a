"""Multigrid training integration: the schedule drives real training —
per-bucket compiled steps, LR scaling, final-epochs fine bucket — through
both the library API and the config CLI."""

import numpy as np
import pytest

from cross_modal_video_engine_tpu.cli import recognition_train
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.recognizer import BackboneClassifier
from cross_modal_video_engine_tpu.models.resnet3d import (ResNet3D,
                                                          ResNet3DConfig)
from cross_modal_video_engine_tpu.train.multigrid import (GridBucket,
                                                          MultigridSchedule)
from cross_modal_video_engine_tpu.train.recognition_trainer import (
    RecognitionTrainConfig, adapt_clips_to_bucket, train_multigrid)

rng = np.random.default_rng(733)


def test_adapt_clips_to_bucket():
    clips = rng.standard_normal((2, 8, 16, 16, 3)).astype(np.float32)
    b = GridBucket(batch_size=2, num_frames=4, resolution=8)
    out = adapt_clips_to_bucket(clips, b)
    assert out.shape == (2, 4, 8, 8, 3)
    # identity bucket is a no-op
    same = adapt_clips_to_bucket(clips, GridBucket(2, 8, 16))
    np.testing.assert_allclose(np.asarray(same), clips)


def _toy_data(n=16, T=8, R=16):
    # brightness encodes the class
    labels = np.arange(n) % 2
    clips = np.where(labels[:, None, None, None, None] == 0, -0.8, 0.8)
    clips = (clips + 0.1 * rng.standard_normal((n, T, R, R, 3))
             ).astype(np.float32)
    return clips, labels.astype(np.int32)


def test_train_multigrid_visits_buckets_and_learns():
    import jax

    cfg = ResNet3DConfig(stage_blocks=(1, 1), base_channels=8,
                         stage_temporal_kernels=(1, 3))
    model = BackboneClassifier(ResNet3D(cfg), num_classes=2)
    clips, labels = _toy_data()

    schedule = MultigridSchedule(
        buckets=(GridBucket(8, 4, 8), GridBucket(4, 8, 16)),
        long_cycle_epochs=2, base_batch=4, base_lr=0.0, final_epochs=2)
    tcfg = RecognitionTrainConfig(optimizer="adamw", learning_rate=5e-3,
                                  grad_clip=1.0)

    def epoch_batches(epoch):
        order = np.random.default_rng(epoch).permutation(len(clips))
        for i in range(0, len(clips), 8):
            idx = order[i:i + 8]
            yield clips[idx], labels[idx]

    variables = model.init(jax.random.key(0),
                           adapt_clips_to_bucket(clips[:1],
                                                 schedule.buckets[0]))
    (out_vars, _), history = train_multigrid(
        model, variables, tcfg, schedule, epoch_batches, total_epochs=6)

    buckets_seen = {h["bucket"] for h in history}
    assert len(buckets_seen) >= 2, history
    # final epochs always use the finest bucket
    assert history[-1]["bucket"] == (4, 8, 16)
    assert history[-2]["bucket"] == (4, 8, 16)
    # coarse epochs scaled LR by batch ratio
    assert history[0]["lr_scale"] == 2.0
    # it learned the brightness rule and loss improved
    assert history[-1]["loss"] < history[0]["loss"]
    assert history[-1]["top1_acc"] >= 0.9
    assert "batch_stats" in out_vars      # BN stats updated + returned


@pytest.mark.full    # full lane: CLI wrapper of the same loop test_train_multigrid_visits_buckets_and_learns drives default
def test_multigrid_cli(tmp_path):
    vdir = tmp_path / "videos"
    vdir.mkdir()
    lines = []
    for i in range(8):
        label = i % 2
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
    backbone=dict(type='ResNet3D', stage_blocks=[1, 1], base_channels=8,
                  stage_temporal_kernels=[1, 3]),
    num_classes=2)
data = dict(
    train=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    val=dict(ann_file=r'{ann}', data_prefix=r'{vdir}'),
    pipeline=[
        dict(type='DecordInit'),
        dict(type='SampleFrames', clip_len=8, frame_interval=1,
             num_clips=1, test_mode=True),
        dict(type='DecordDecode'),
        dict(type='Resize', scale=(16, 16), keep_ratio=False),
        dict(type='Normalize', mean=[127.5]*3, std=[127.5]*3),
        dict(type='FormatShape', input_format='NTHWC'),
    ],
    videos_per_gpu=8)
optimizer = dict(optimizer='adamw', learning_rate=3e-3, grad_clip=1.0)
multigrid = dict(
    buckets=[[8, 4, 8], [4, 8, 16]],
    long_cycle_epochs=1, base_batch=4, final_epochs=1)
total_epochs = 4
""")
    work = str(tmp_path / "work")
    import os
    os.makedirs(work)
    history = recognition_train.main([str(cfg), "--work_dir", work])
    assert len({h["bucket"] for h in history}) >= 2
    assert history[-1]["bucket"] == (4, 8, 16)
    assert os.path.exists(os.path.join(work, "multigrid_final"))


def test_multigrid_precise_bn_recalibrates():
    import jax

    cfg = ResNet3DConfig(stage_blocks=(1,), base_channels=8,
                         stage_temporal_kernels=(1,))
    model = BackboneClassifier(ResNet3D(cfg), num_classes=2)
    clips, labels = _toy_data(n=8)
    schedule = MultigridSchedule(
        buckets=(GridBucket(4, 4, 8), GridBucket(4, 8, 16)),
        long_cycle_epochs=1, base_batch=4, final_epochs=1)
    tcfg = RecognitionTrainConfig(optimizer="adamw", learning_rate=5e-3,
                                  grad_clip=1.0)

    def epoch_batches(epoch):
        for i in range(0, 8, 4):
            yield clips[i:i + 4], labels[i:i + 4]

    variables = model.init(jax.random.key(0),
                           adapt_clips_to_bucket(clips[:1],
                                                 schedule.buckets[0]))
    (plain, _), _ = train_multigrid(model, variables, tcfg, schedule,
                                    epoch_batches, total_epochs=2)
    (recal, _), _ = train_multigrid(model, variables, tcfg, schedule,
                                    epoch_batches, total_epochs=2,
                                    precise_bn_batches=2)
    # params identical (same rng stream), stats recalibrated differ
    for a, b in zip(jax.tree.leaves(plain["params"]),
                    jax.tree.leaves(recal["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(plain["batch_stats"]),
                             jax.tree.leaves(recal["batch_stats"]))]
    assert any(diffs)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(recal["batch_stats"]))
