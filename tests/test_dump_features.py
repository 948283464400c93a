"""Dataset-scale embedding/gradient dump CLI (inference_batch/_grad
equivalents)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.cli import dump_features
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3D
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint

rng = np.random.default_rng(911)

TS_KW = dict(num_frames=4, img_size=16, patch_size=8, embed_dims=16,
             num_heads=2, num_layers=2, drop_path_max=0.0)


def _fixture(tmp_path, n=4):
    vdir = tmp_path / "videos"
    vdir.mkdir()
    lines = []
    for i in range(n):
        frames = rng.integers(0, 255, (12, 24, 24, 3)).astype(np.uint8)
        write_test_video(str(vdir / f"v{i}.mp4"), frames)
        lines.append(f"v{i}.mp4 {i % 2}")
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
    model = Recognizer3D(TimeSformerConfig(**TS_KW), num_classes=3)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 4, 16, 16, 3), jnp.float32))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, variables, {"backbone": TS_KW, "num_classes": 3})
    return str(cfg), ckpt


def test_dump_embeddings_and_grads(tmp_path):
    cfg, ckpt = _fixture(tmp_path)
    out = str(tmp_path / "feats.pkl")
    feats = dump_features.main([
        cfg, "--checkpoint", ckpt, "--mode", "both",
        "--layers", "0", "1", "--out", out])
    assert len(feats) == 4
    with open(out, "rb") as f:
        loaded = pickle.load(f)
    assert sorted(loaded) == sorted(feats)
    for name, rec in loaded.items():
        assert os.path.basename(name).startswith("v")
        assert 0 <= rec["pred"] < 3
        for l in (0, 1):
            assert rec[l].shape == (16,)
            assert rec[("grad", l)].shape == (16,)
            assert np.isfinite(rec[l]).all()
        # gradients are non-trivial
        assert np.abs(rec[("grad", 0)]).max() > 0


def test_dump_embeddings_only(tmp_path):
    cfg, ckpt = _fixture(tmp_path, n=3)
    out = str(tmp_path / "emb.pkl")
    feats = dump_features.main([
        cfg, "--checkpoint", ckpt, "--mode", "embeddings",
        "--layers", "1", "--out", out])
    assert len(feats) == 3
    rec = next(iter(feats.values()))
    assert set(rec) == {"pred", 1}


def test_gen_videolist_and_organize_masks(tmp_path):
    from cross_modal_video_engine_tpu.cli.data_tools import main as dt_main

    train = tmp_path / "train"
    for cls, vids in [("jump", ["a.mp4", "b.mp4"]), ("run", ["c.mp4"])]:
        (train / cls).mkdir(parents=True)
        for v in vids:
            (train / cls / v).write_bytes(b"x")
    # flat detector output: concept/video
    mask = tmp_path / "mask_flat"
    (mask / "person").mkdir(parents=True)
    (mask / "person" / "a.mp4").write_bytes(b"m")
    (mask / "person" / "c.mp4").write_bytes(b"m")
    (mask / "ball").mkdir(parents=True)
    (mask / "ball" / "b.mp4").write_bytes(b"m")

    target = tmp_path / "mask_tree"
    dt_main(["organize_masks", "--train_root", str(train),
             "--mask_root", str(mask), "--target_root", str(target)])
    assert (target / "jump" / "person" / "a.mp4").exists()
    assert (target / "jump" / "ball" / "b.mp4").exists()
    assert (target / "run" / "person" / "c.mp4").exists()

    out = tmp_path / "lists"
    dt_main(["gen_videolist", "--train_root", str(train),
             "--mask_root", str(target), "--output", str(out)])
    tl = (out / "trainlist_classwise" / "jump.txt").read_text().splitlines()
    assert len(tl) == 2 and tl[0].endswith(" 0")
    cl = (out / "conceptlist_classwise" / "jump.txt").read_text().splitlines()
    assert len(cl) == 2  # person/a.mp4 + ball/b.mp4
    assert any("person" in line for line in cl)
