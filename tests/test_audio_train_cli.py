"""Audio recognition training CLI e2e (cli/audio_train.py over log-mel
feature files — the recognition_audio family)."""

import os

import numpy as np

from cross_modal_video_engine_tpu.cli import audio_train

rng = np.random.default_rng(13)


def _fixture(tmp_path, n=8):
    fdir = tmp_path / "feats"
    fdir.mkdir()
    lines = []
    for i in range(n):
        label = i % 2
        # class 0: low-band energy; class 1: high-band energy
        feat = rng.standard_normal((120, 80)).astype(np.float32) * 0.1
        band = slice(0, 40) if label == 0 else slice(40, 80)
        feat[:, band] += 2.0
        np.save(fdir / f"a{i}.npy", feat)
        lines.append(f"a{i} 120 {label}")
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(lines))

    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
model = dict(num_classes=2, channels=[8, 16], n_mels=80)
data = dict(
    train=dict(ann_file=r'{ann}', data_prefix=r'{fdir}'),
    val=dict(ann_file=r'{ann}', data_prefix=r'{fdir}'),
    pipeline=[
        dict(type='LoadAudioFeature'),
        dict(type='SampleFrames', clip_len=32, frame_interval=2,
             num_clips=1, test_mode=True),
        dict(type='AudioFeatureSelector', fixed_length=64),
    ],
    videos_per_gpu=8)
optimizer = dict(optimizer='adamw', learning_rate=3e-3, grad_clip=1.0)
total_epochs = 8
eval_interval = 2
""")
    return str(cfg)


def test_audio_train_cli(tmp_path):
    cfg = _fixture(tmp_path)
    work = str(tmp_path / "work")
    history = audio_train.main([cfg, "--work_dir", work])
    assert len(history) == 8
    assert history[-1]["train_top1"] >= 0.8   # learned the band rule
    best = [f for f in os.listdir(work) if f.startswith("model_best")]
    assert best
    from cross_modal_video_engine_tpu.train.checkpoint import load_checkpoint
    variables, cfg_d, _ = load_checkpoint(os.path.join(work, best[0]))
    assert "batch_stats" in variables
    assert cfg_d["num_classes"] == 2

    # resume
    history2 = audio_train.main([cfg, "--work_dir", work, "--resume",
                                 "--total_epochs", "9"])
    assert [h["epoch"] for h in history2] == [8]
