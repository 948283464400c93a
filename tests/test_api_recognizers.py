"""High-level API + Recognizer2D/3DCLIP + data_tools CLI."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.api import (
    TEST_PIPELINE, inference_recognizer, init_recognizer)
from cross_modal_video_engine_tpu.cli import data_tools
from cross_modal_video_engine_tpu.io.bigfile import BigFile, write_bigfile
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.backbones2d import (
    TSMConfig, TSMResNet)
from cross_modal_video_engine_tpu.models.clip import CLIPConfig, VisionTower
from cross_modal_video_engine_tpu.models.heads import TSNHead
from cross_modal_video_engine_tpu.models.recognizer import (
    Recognizer2D, Recognizer3D, Recognizer3DCLIP)
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint

rng = np.random.default_rng(311)

TS_KW = dict(num_frames=4, img_size=32, patch_size=8, embed_dims=16,
             num_heads=2, num_layers=2, drop_path_max=0.0)

TINY_PIPE = [
    dict(type="DecordInit"),
    dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1,
         test_mode=True),
    dict(type="DecordDecode"),
    dict(type="Resize", scale=(32, 32), keep_ratio=False),
    dict(type="Normalize", mean=[127.5] * 3, std=[127.5] * 3),
    dict(type="FormatShape", input_format="NTHWC"),
]


def test_init_and_inference_recognizer(tmp_path):
    ts = TimeSformerConfig(**TS_KW)
    model0 = Recognizer3D(ts, num_classes=5)
    v = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = model0.init(jax.random.key(0), v)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, variables, {"backbone": TS_KW, "num_classes": 5})

    model, variables2, cfg = init_recognizer(ckpt)
    video = str(tmp_path / "v.mp4")
    write_test_video(video, rng.integers(0, 255, (16, 40, 48, 3),
                                         dtype=np.uint8))
    scores, captured = inference_recognizer(model, variables2, video,
                                            outputs=[1],
                                            pipeline=TINY_PIPE)
    assert scores.shape == (1, 5)
    assert 1 in captured and captured[1].ndim == 3
    # shuffle probe runs and (untrained timesformer) leaves scores intact
    scores_s, _ = inference_recognizer(model, variables2, video,
                                       pipeline=TINY_PIPE,
                                       shuffle_idx=[3, 2, 1, 0])
    assert scores_s.shape == (1, 5)


def test_recognizer2d_and_clip():
    tsm = TSMResNet(TSMConfig(stage_blocks=(1, 1), base_channels=8))
    head = TSNHead(num_classes=6)
    rec = Recognizer2D(backbone=tsm, cls_head=head)
    v = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    variables = rec.init(jax.random.key(0), v)
    probs = rec.apply(variables, v, method="forward_test")
    assert probs.shape == (2, 6)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)

    vt = VisionTower(CLIPConfig(embed_dim=16, image_resolution=32,
                                vision_width=24, vision_layers=1,
                                vision_heads=2, patch_size=8))
    rec3 = Recognizer3DCLIP(clip_vision=vt, num_classes=7)
    variables = rec3.init(jax.random.key(0), v)
    scores = rec3.apply(variables, v)
    assert scores.shape == (2, 7)


def test_data_tools_cli(tmp_path):
    # txt2bin
    txt = str(tmp_path / "f.txt")
    with open(txt, "w") as f:
        f.write("a 1 2 3\nb 4 5 6\n")
    out = str(tmp_path / "bf")
    data_tools.main(["txt2bin", "--input", txt, "--output", out])
    bf = BigFile(out)
    np.testing.assert_array_equal(bf.read_one("b"), [4, 5, 6])

    # combine_features
    out2 = str(tmp_path / "bf2")
    write_bigfile(out2, ["a", "b"], np.array([[9.], [8.]], np.float32))
    comb = str(tmp_path / "comb")
    data_tools.main(["combine_features", "--a", out, "--b", out2,
                     "--output", comb])
    cf = BigFile(comb)
    np.testing.assert_array_equal(cf.read_one("a"), [1, 2, 3, 9])

    # format_check
    caps = str(tmp_path / "caps.txt")
    with open(caps, "w") as f:
        f.write("vid1#0 a dog runs\nvid1#1 a dog sits\n")
    rc = data_tools.main(["format_check", "--captions", caps])
    assert rc == 0
    with open(caps, "a") as f:
        f.write("badid no hash marker\n")
    rc = data_tools.main(["format_check", "--captions", caps])
    assert rc == 1

    # build_vocab + build_tags
    vd = str(tmp_path / "vocab")
    data_tools.main(["build_vocab", "--captions", caps, "--output", vd,
                     "--threshold", "1"])
    assert os.path.exists(os.path.join(vd, "rnn", "word_vocab_1.json"))
    tags = str(tmp_path / "tags.txt")
    data_tools.main(["build_tags", "--captions", caps, "--output", tags,
                     "--vocab_size", "16"])
    assert "dog" in open(tags).read()
