"""End-to-end CLI tests on a tiny on-disk collection."""

import os

import numpy as np

from fixtures import make_collection, make_checkpoint

from cross_modal_video_engine_tpu.cli import retrieval_inference, retrieval_tester
from cross_modal_video_engine_tpu.train.checkpoint import (
    load_checkpoint, best_checkpoint_manager)


def test_inference_cli(tmp_path):
    root = str(tmp_path)
    info = make_collection(root)
    ckpt, cfg = make_checkpoint(root, info)
    ids = retrieval_inference.main([
        "--checkpoint", ckpt, "--rootpath", root,
        "--collection", info["collection"],
        "--visual_feature", info["feature"],
        "--input", "a dog runs fast", "--topK", "5",
        "--index_cache", os.path.join(root, "video_index.npz"),
    ])
    assert len(ids) == 5 and len(set(ids)) == 5
    assert all(i.startswith("video") for i in ids)
    assert os.path.exists(os.path.join(root, "video_index.npz"))
    # cached-index second run gives identical results
    ids2 = retrieval_inference.main([
        "--checkpoint", ckpt, "--rootpath", root,
        "--collection", info["collection"],
        "--visual_feature", info["feature"],
        "--input", "a dog runs fast", "--topK", "5",
        "--index_cache", os.path.join(root, "video_index.npz"),
    ])
    assert ids == ids2


def test_tester_cli(tmp_path):
    root = str(tmp_path)
    info = make_collection(root, n_videos=8, caps_per_video=2)
    ckpt, cfg = make_checkpoint(root, info)
    report = retrieval_tester.main([
        "--checkpoint", ckpt, "--rootpath", root,
        "--testCollection", info["collection"],
        "--visual_feature", info["feature"],
        "--batch_size", "4",
        "--output_dir", os.path.join(root, "out"),
    ])
    assert 0 <= report["t2v"]["r10"] <= 100
    assert report["rsum"] > 0
    saved = np.load(os.path.join(root, "out", "pred_errors_matrix.npz"))
    assert saved["errors"].shape == (16, 8)
    # error matrix must be finite and captions of a video mostly
    assert np.isfinite(saved["errors"]).all()


def test_checkpoint_roundtrip(tmp_path):
    root = str(tmp_path)
    info = make_collection(root, n_videos=4, caps_per_video=1)
    ckpt, cfg = make_checkpoint(root, info)
    variables, config, meta = load_checkpoint(ckpt)
    assert config["common_dim"] == cfg.common_dim
    assert meta["epoch"] == 0
    assert "params" in variables


def test_best_checkpoint_manager(tmp_path):
    import jax.numpy as jnp
    save_best = best_checkpoint_manager(str(tmp_path))
    v = {"params": {"w": jnp.ones((2, 2))}}
    assert save_best(v, None, 1.0)
    assert not save_best(v, None, 0.5)       # worse -> not saved
    assert save_best(v, None, 2.0)
    best = os.path.join(str(tmp_path), "model_best")
    assert os.path.exists(best)
    dirs = [d for d in os.listdir(str(tmp_path)) if d.startswith("model_best_")]
    assert dirs == ["model_best_2.0000"]      # old best deleted
