"""Caption dataset-evaluation CLI (seq mAP) on a tiny Relseq fixture."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.cli import caption_test
from cross_modal_video_engine_tpu.cli.caption_test import eval_labels
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.decoder_head import RNNDecoderConfig
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3DRelseq
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint

rng = np.random.default_rng(523)

TS_KW = dict(num_frames=4, img_size=16, patch_size=8, embed_dims=16,
             num_heads=2, num_layers=1, drop_path_max=0.0)


def test_eval_labels_end_fill():
    mat = np.zeros((4, 5), np.float32)
    mat[0, 1] = mat[1, 2] = 1
    mask = np.asarray([1, 1, 0, 0], np.float32)
    out = eval_labels(mat, mask)
    np.testing.assert_array_equal(out[:2], mat[:2])
    np.testing.assert_array_equal(out[2:, -1], 1.0)
    assert out[2:, :-1].sum() == 0


def test_caption_test_cli(tmp_path):
    C, L = 6, 3
    vdir = tmp_path / "videos"
    vdir.mkdir()
    lines = []
    for i in range(5):
        frames = rng.integers(0, 255, (12, 24, 24, 3)).astype(np.uint8)
        write_test_video(str(vdir / f"v{i}.mp4"), frames)
        lines.append(f"v{i}.mp4 {i % 4},{(i + 1) % 4}->{(i + 2) % 4}")
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(lines))
    cfg = tmp_path / "config.py"
    cfg.write_text(f"""
data = dict(
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
    videos_per_gpu=2)
""")
    dec = RNNDecoderConfig(num_classes=C, in_channels=16, max_len=L)
    model = Recognizer3DRelseq(TimeSformerConfig(**TS_KW), dec)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 4, 16, 16, 3), jnp.float32),
        jnp.zeros((1, L, C), jnp.float32), mode="train")
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, variables,
                    {"backbone": TS_KW, "decoder": dec.__dict__})

    out = str(tmp_path / "scores.npz")
    report = caption_test.main([str(cfg), "--checkpoint", ckpt,
                                "--out", out])
    assert report["num_videos"] == 5
    assert 0.0 <= report["seq_mAP"] <= 1.0
    assert 0.0 <= report["seq_mAP_labeled_classes"] <= 1.0
    saved = np.load(out)
    assert saved["scores"].shape == (5, L, C)
    assert saved["per_class_ap"].shape == (C,)
