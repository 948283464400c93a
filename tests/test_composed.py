"""Composed-retrieval dataset + CLI tests."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.data.composed_dataset import (
    ComposedVideoDataset, FeatureStore, adaptive_avg_pool_axis,
    pool_middle_feature, save_video_features)
from cross_modal_video_engine_tpu.cli import composed_inference
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.clip import CLIPConfig, CLIPModel
from cross_modal_video_engine_tpu.models.combiner import Combiner, CombinerConfig
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint
from cross_modal_video_engine_tpu.utils.bpe import write_toy_merges

rng = np.random.default_rng(71)


def test_adaptive_pool_matches_torch():
    import torch
    x = rng.standard_normal((13, 7)).astype(np.float32)
    got = adaptive_avg_pool_axis(x, 8, axis=0)
    want = torch.nn.functional.adaptive_avg_pool1d(
        torch.from_numpy(x.T)[None], 8)[0].numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-5)
    m = rng.standard_normal((5, 33, 4)).astype(np.float32)
    out = pool_middle_feature(m, frames=8, tokens=16)
    assert out.shape == (8, 16, 4)


def _mk_dataset(tmp_path, n_videos=6, n_triplets=8, D=12):
    feat_dir = str(tmp_path / "feats")
    os.makedirs(feat_dir, exist_ok=True)
    names = [f"vid{i}" for i in range(n_videos)]
    for n in names:
        save_video_features(os.path.join(feat_dir, n + ".npz"),
                            rng.standard_normal((9, D)).astype(np.float32),
                            rng.standard_normal((9, 20, D)).astype(np.float32))
    tsv = str(tmp_path / "triplets.tsv")
    with open(tsv, "w") as f:
        for i in range(n_triplets):
            a, b = rng.choice(n_videos, 2, replace=False)
            f.write(f"id{a}\tid{b}\tmake it different {i}\tmain\tcls\n")
    id2name = {f"id{i}": names[i] for i in range(n_videos)}
    j = str(tmp_path / "id2vdoname.json")
    json.dump(id2name, open(j, "w"))
    store = FeatureStore({"main": feat_dir})
    return tsv, store, j, D


def test_composed_dataset_modes(tmp_path):
    tsv, store, j, D = _mk_dataset(tmp_path)
    ds = ComposedVideoDataset(tsv, store, j, mode="relative", frames=8,
                              tokens=16)
    assert len(ds) == 8
    (rh, rm), (th, tm), cap, ref_row, tgt_row = ds[0]
    assert rh.shape == (8, D) and rm.shape == (8, 16, D)
    assert isinstance(cap, str) and ref_row != tgt_row

    classic = ComposedVideoDataset(tsv, store, j, mode="classic")
    i, (h, m) = classic[0]
    assert i == 0 and h.shape == (8, D)

    batch = next(ds.batches(4))
    assert batch["ref_high"].shape == (4, 8, D)
    assert batch["ref_middle"].shape == (4, 8, 16, D)
    assert len(batch["captions"]) == 4


def test_composed_inference_cli(tmp_path):
    # tiny CLIP + combiner checkpoints and a directory of little videos
    ccfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=24,
                      vision_layers=1, vision_heads=2, patch_size=8,
                      context_length=12, vocab_size=520, text_width=16,
                      text_heads=2, text_layers=1)
    clip_model = CLIPModel(ccfg)
    cv = clip_model.init(jax.random.key(0),
                         jnp.zeros((1, 32, 32, 3), jnp.float32),
                         jnp.zeros((1, 12), jnp.int32))
    clip_ckpt = str(tmp_path / "clip_ckpt")
    save_checkpoint(clip_ckpt, cv, ccfg)

    comb_cfg = CombinerConfig(clip_feature_dim=24, projection_dim=16,
                              hidden_dim=24, n_heads=2)
    # NOTE: middle width (vision_width=24) is the combiner clip_feature_dim
    combiner = Combiner(comb_cfg)
    high = jnp.zeros((1, 8, 24), jnp.float32)
    middle = jnp.zeros((1, 8, 16, 24), jnp.float32)
    text = jnp.zeros((1, 24), jnp.float32)
    comb_ckpt = str(tmp_path / "comb_ckpt")
    # text features are embed_dim (16) but combiner works on clip_feature_dim;
    # here we use high-dim = middle width for the tiny test via projection-free
    # path: pass 24-dim text by padding in the CLI? -> instead make embed_dim
    # match: rebuild clip with embed_dim 24 is simpler:
    save_checkpoint(comb_ckpt,
                    combiner.init(jax.random.key(1), (high, middle), text,
                                  (high, middle)),
                    comb_cfg)

    videos_dir = str(tmp_path / "videos")
    os.makedirs(videos_dir)
    for i in range(3):
        frames = rng.integers(0, 255, (12, 32, 40, 3), dtype=np.uint8)
        write_test_video(os.path.join(videos_dir, f"v{i}.mp4"), frames)
    ref = str(tmp_path / "ref.mp4")
    write_test_video(ref, rng.integers(0, 255, (12, 32, 40, 3),
                                       dtype=np.uint8))
    merges = str(tmp_path / "merges.txt")
    write_toy_merges(merges, ["make it red", "make it blue"], 16)

    # embed_dim(16) != clip_feature_dim(24): the CLI must reject cleanly OR
    # work when dims line up. Use matching dims:
    ccfg2 = CLIPConfig(**{**ccfg.__dict__, "embed_dim": 24})
    clip_model2 = CLIPModel(ccfg2)
    cv2 = clip_model2.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3), jnp.float32),
                           jnp.zeros((1, 12), jnp.int32))
    save_checkpoint(clip_ckpt, cv2, ccfg2)

    out_dir = str(tmp_path / "outputs")
    top = composed_inference.main([
        "--input_vdo", ref, "--input_modified_text", "make it red",
        "--videos_dir", videos_dir, "--clip_checkpoint", clip_ckpt,
        "--combiner_checkpoint", comb_ckpt, "--merges", merges,
        "--output_dir", out_dir, "--topK", "2",
        "--feature_cache", str(tmp_path / "cache"),
    ])
    assert len(top) == 2 and top[0].startswith("v")
    assert os.path.exists(os.path.join(out_dir, top[0]))
    # cache populated; second run identical
    top2 = composed_inference.main([
        "--input_vdo", ref, "--input_modified_text", "make it red",
        "--videos_dir", videos_dir, "--clip_checkpoint", clip_ckpt,
        "--combiner_checkpoint", comb_ckpt, "--merges", merges,
        "--topK", "2",
        "--feature_cache", str(tmp_path / "cache"),
    ])
    assert top == top2
