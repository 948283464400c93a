"""End-to-end HTTP service test: boot the server with tiny models for all
four capabilities and drive every route over real HTTP — the README's
"live backend for the four demo pages" claim, proven."""

import argparse
import json
import os
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp

from fixtures import make_collection, make_checkpoint

from cross_modal_video_engine_tpu.cli import caption_inference, serve
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.clip import CLIPConfig, CLIPModel
from cross_modal_video_engine_tpu.models.combiner import (Combiner,
                                                          CombinerConfig)
from cross_modal_video_engine_tpu.models.decoder_head import RNNDecoderConfig
from cross_modal_video_engine_tpu.models.recognizer import (
    Recognizer3D, Recognizer3DRelseq)
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig
from cross_modal_video_engine_tpu.service.app import serve_in_thread
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint
from cross_modal_video_engine_tpu.utils.bpe import write_toy_merges

rng = np.random.default_rng(211)

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

CLIP_CFG = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=24,
                      vision_layers=1, vision_heads=2, patch_size=8,
                      context_length=12, vocab_size=800, text_width=16,
                      text_heads=2, text_layers=1)


def _post(port, route, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/{route}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_all_four_routes(tmp_path, monkeypatch):
    monkeypatch.setattr(caption_inference, "DEFAULT_PIPELINE", TINY_PIPE)
    root = str(tmp_path)

    # --- retrieval fixtures
    info = make_collection(root)
    retr_ckpt, _ = make_checkpoint(root, info)

    # --- caption fixtures
    dec = RNNDecoderConfig(num_classes=6, in_channels=16, max_len=3)
    cap_model = Recognizer3DRelseq(TimeSformerConfig(**TS_KW), dec)
    cap_vars = cap_model.init(
        jax.random.key(0), jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 3, 6), jnp.float32), mode="train")
    cap_ckpt = os.path.join(root, "cap_ckpt")
    save_checkpoint(cap_ckpt, cap_vars,
                    {"backbone": TS_KW, "decoder": dec.__dict__})

    # --- composed retrieval fixtures (tiny CLIP + combiner + videos dir)
    clip_model = CLIPModel(CLIP_CFG)
    clip_vars = clip_model.init(jax.random.key(1),
                                jnp.zeros((1, 32, 32, 3), jnp.float32),
                                jnp.zeros((1, 12), jnp.int32))
    clip_ckpt = os.path.join(root, "clip_ckpt")
    save_checkpoint(clip_ckpt, clip_vars, CLIP_CFG)
    comb_cfg = CombinerConfig(clip_feature_dim=16, projection_dim=8,
                              hidden_dim=16, n_heads=2)
    combiner = Combiner(comb_cfg)
    comb_vars = combiner.init(
        jax.random.key(2), (jnp.zeros((1, 2, 16)), jnp.zeros((1, 2, 4, 16))),
        jnp.zeros((1, 16)), (jnp.zeros((1, 2, 16)), None))
    comb_ckpt = os.path.join(root, "comb_ckpt")
    save_checkpoint(comb_ckpt, comb_vars, comb_cfg)
    videos_dir = os.path.join(root, "videos")
    os.makedirs(videos_dir)
    for i in range(3):
        write_test_video(os.path.join(videos_dir, f"cand{i}.mp4"),
                         rng.integers(0, 255, (12, 40, 48, 3),
                                      dtype=np.uint8))
    ref_video = os.path.join(root, "ref.mp4")
    write_test_video(ref_video, rng.integers(0, 255, (12, 40, 48, 3),
                                             dtype=np.uint8))
    merges = os.path.join(root, "merges.txt")
    write_toy_merges(merges, ["make the video red", "a dog runs"],
                     n_merges=16)

    # --- explain fixtures
    rec_model = Recognizer3D(TimeSformerConfig(**TS_KW), num_classes=5)
    rec_vars = rec_model.init(jax.random.key(3),
                              jnp.zeros((1, 4, 32, 32, 3), jnp.float32))
    rec_ckpt = os.path.join(root, "rec_ckpt")
    save_checkpoint(rec_ckpt, rec_vars, {"backbone": TS_KW, "num_classes": 5})
    banks = os.path.join(root, "banks.npz")
    np.savez(banks,
             symbolic_matrix=rng.standard_normal((3, 16)).astype(np.float32),
             symbolic_names=np.array(["dog", "cat", "car"]))
    label_names = os.path.join(root, "names.json")
    json.dump([f"label{i}" for i in range(5)], open(label_names, "w"))

    args = argparse.Namespace(
        retrieval_checkpoint=retr_ckpt, rootpath=root,
        collection=info["collection"], visual_feature=info["feature"],
        index_cache=None, caption_checkpoint=cap_ckpt,
        clip_checkpoint=clip_ckpt, combiner_checkpoint=comb_ckpt,
        videos_dir=videos_dir, merges=merges,
        explain_checkpoint=rec_ckpt, concept_banks=banks,
        target_layer=0, label_names=label_names,
        max_wait_ms=50.0)     # generous straggler window -> coalescing
                              # is deterministic under the load test
    service = serve.build_service(args)
    assert sorted(service.handlers) == [
        "caption", "composed_retrieval", "explain", "retrieval"]

    server, _ = serve_in_thread(service, port=0)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            h = json.loads(r.read())
        assert sorted(h["routes"]) == [
            "caption", "composed_retrieval", "explain", "retrieval"]

        out = _post(port, "retrieval", {"query": "a dog runs fast",
                                        "topK": 4})
        assert len(out["results"]) == 4
        assert all(r["video"].startswith("video") for r in out["results"])

        out = _post(port, "caption", {"video": ref_video})
        assert len(out["steps"]) == 3

        out = _post(port, "composed_retrieval",
                    {"reference_video": ref_video, "text": "make it red",
                     "topK": 2})
        assert len(out["results"]) == 2
        assert all(r.startswith("cand") for r in out["results"])

        out = _post(port, "explain", {"video": ref_video, "topK": 2})
        assert out["prediction"].startswith("label")
        assert len(out["symbolic_top"]) == 2
        assert len(out["scores"]) == 5

        # concurrent requests coalesce through every route's
        # MicroBatcher: N requests land in < N device batches
        import threading

        def load(route, payload_fn, n=8):
            batcher = service.handlers[route].batcher
            rows0, batches0 = batcher.rows_run, batcher.batches_run
            results = [None] * n

            def hit(i):
                results[i] = _post(port, route, payload_fn(i))

            threads = [threading.Thread(target=hit, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return (results, batcher.rows_run - rows0,
                    batcher.batches_run - batches0)

        results, rows, batches = load(
            "retrieval", lambda i: {"query": f"query number {i}",
                                    "topK": 2})
        assert all(len(r["results"]) == 2 for r in results)
        assert rows == 8 and batches < 8

        results, rows, batches = load(
            "caption", lambda i: {"video": ref_video})
        assert all(len(r["steps"]) == 3 for r in results)
        assert rows == 8 and batches < 8

        results, rows, batches = load(
            "explain", lambda i: {"video": ref_video, "topK": 2})
        assert all(len(r["symbolic_top"]) == 2 for r in results)
        assert rows == 8 and batches < 8

        results, rows, batches = load(
            "composed_retrieval",
            lambda i: {"reference_video": ref_video,
                       "text": "make it red", "topK": 1}, n=4)
        assert all(len(r["results"]) == 1 for r in results)
        assert rows == 4 and batches < 4
    finally:
        server.shutdown()
