"""Caption/explain/combiner-train CLI tests on tiny fixtures."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.cli import (
    caption_inference, combiner_trainer, explain_demo)
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.decoder_head import RNNDecoderConfig
from cross_modal_video_engine_tpu.models.recognizer import (
    Recognizer3D, Recognizer3DRelseq)
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint

rng = np.random.default_rng(171)

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


def test_caption_cli(tmp_path, monkeypatch):
    ts = TimeSformerConfig(**TS_KW)
    dec = RNNDecoderConfig(num_classes=6, in_channels=16, max_len=3)
    model = Recognizer3DRelseq(ts, dec)
    v = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    tgt = jnp.zeros((1, 3, 6), jnp.float32)
    variables = model.init(jax.random.key(0), v, tgt, mode="train")
    ckpt = str(tmp_path / "cap_ckpt")
    save_checkpoint(ckpt, variables,
                    {"backbone": TS_KW, "decoder": dec.__dict__})
    # the checkpoint stores plain dicts; loader rebuilds configs
    video = str(tmp_path / "v.mp4")
    write_test_video(video, rng.integers(0, 255, (16, 40, 48, 3),
                                         dtype=np.uint8))
    names = str(tmp_path / "names.json")
    json.dump([f"label{i}" for i in range(6)], open(names, "w"))
    monkeypatch.setattr(caption_inference, "DEFAULT_PIPELINE", TINY_PIPE)
    steps = caption_inference.main([
        "--checkpoint", ckpt, "--video", video, "--label_names", names,
        "--threshold", "0.4"])
    assert len(steps) == 3


def test_explain_cli(tmp_path, monkeypatch):
    ts = TimeSformerConfig(**TS_KW)
    model = Recognizer3D(ts, num_classes=5)
    v = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), v)
    ckpt = str(tmp_path / "rec_ckpt")
    save_checkpoint(ckpt, variables,
                    {"backbone": TS_KW, "num_classes": 5})
    video = str(tmp_path / "v.mp4")
    write_test_video(video, rng.integers(0, 255, (16, 40, 48, 3),
                                         dtype=np.uint8))
    banks = str(tmp_path / "banks.npz")
    np.savez(banks,
             symbolic_matrix=rng.standard_normal((3, 16)).astype(np.float32),
             symbolic_names=np.array(["dog", "cat", "car"]))
    monkeypatch.setattr(explain_demo, "DEFAULT_PIPELINE", TINY_PIPE)
    out = explain_demo.main([
        "--checkpoint", ckpt, "--target_video_path", video,
        "--concept_banks", banks, "--target_layer", "0", "--topk", "2"])
    assert len(out["symbolic_top"]) == 2
    assert 0 <= out["pred"][0] < 5


def test_combiner_trainer_cli(tmp_path):
    from cross_modal_video_engine_tpu.data.composed_dataset import (
        ComposedVideoDataset, FeatureStore, save_video_features)
    from cross_modal_video_engine_tpu.models.combiner import (
        Combiner, CombinerConfig)
    from cross_modal_video_engine_tpu.train.combiner_trainer import (
        CombinerTrainConfig)

    D = 12
    feat_dir = str(tmp_path / "feats")
    os.makedirs(feat_dir)
    base = rng.standard_normal((6, D)).astype(np.float32)
    shift = rng.standard_normal((6, D)).astype(np.float32)
    for i in range(6):
        save_video_features(os.path.join(feat_dir, f"ref{i}.npz"),
                            np.repeat(base[i][None], 4, 0),
                            np.repeat(base[i][None, None], 4, 0).repeat(6, 1))
        save_video_features(os.path.join(feat_dir, f"tgt{i}.npz"),
                            np.repeat((base + shift)[i][None], 4, 0),
                            np.repeat((base + shift)[i][None, None], 4, 0)
                            .repeat(6, 1))
    tsv = str(tmp_path / "t.tsv")
    with open(tsv, "w") as f:
        for i in range(6):
            f.write(f"ref{i}\ttgt{i}\tchange it {i}\tmain\tc\n")
    dataset = ComposedVideoDataset(tsv, FeatureStore({"main": feat_dir}),
                                   frames=4, tokens=4)

    # frozen "text tower": hash captions to the shift vector
    def text_fn(captions):
        out = np.stack([shift[int(c.split()[-1])] for c in captions])
        return jnp.asarray(out)

    comb = Combiner(CombinerConfig(clip_feature_dim=D, projection_dim=8,
                                   hidden_dim=16, n_heads=2))
    tcfg = CombinerTrainConfig(learning_rate=3e-3, validation_frequency=2)
    out_dir = str(tmp_path / "run")
    os.makedirs(out_dir)
    state, history = combiner_trainer.train_combiner(
        comb, dataset, text_fn, tcfg, out_dir, batch_size=6, num_epochs=4)
    assert history[-1]["loss"] < history[0]["loss"]
    assert any("recall_at1" in h for h in history)
    assert os.path.exists(os.path.join(out_dir, "model_best"))
