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


def test_serve_handler_index_dtypes(tmp_path):
    """The serving route's ONE-program wave (tower + search fused,
    ids bitcast beside scores) works in all three stored-row
    precisions, including the in-jit int8 query quantization, and the
    f32 arm's ranking matches the unfused search_ids path exactly."""
    import argparse

    from cross_modal_video_engine_tpu.cli.serve import (
        build_retrieval_handler)

    root = str(tmp_path)
    info = make_collection(root)
    ckpt, _ = make_checkpoint(root, info)
    results = {}
    for dtype in ("float32", "bfloat16", "int8"):
        args = argparse.Namespace(
            retrieval_checkpoint=ckpt, rootpath=root,
            collection=info["collection"], visual_feature=info["feature"],
            index_cache=None, index_dtype=dtype, max_batch=8)
        h = build_retrieval_handler(args)
        out = h({"query": "a dog runs fast", "topK": 5})["results"]
        assert len(out) == 5
        assert all(r["video"].startswith("video") for r in out)
        assert len({r["video"] for r in out}) == 5
        results[dtype] = [r["video"] for r in out]
        h.batcher.close()

    # exact-arm cross-check vs the unfused two-program path
    from cross_modal_video_engine_tpu.cli.common import (
        load_dataset, restore_dual_encoding)
    from cross_modal_video_engine_tpu.cli.retrieval_inference import (
        build_video_index, embed_query)
    model, state = restore_dual_encoding(ckpt)
    ds = load_dataset(root, info["collection"], info["feature"])
    index = build_video_index(model, state["variables"], ds)
    q = embed_query(model, state["variables"], ds, "a dog runs fast")
    _, want = index.search_ids(q, k=5)
    assert results["float32"] == list(want[0])
