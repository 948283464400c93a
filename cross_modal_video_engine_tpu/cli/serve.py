"""Engine HTTP server CLI.

Wires the four capability handlers to the service layer (the live backend
the reference's static web demo never had — Video-engine-web serves
hard-coded results, SURVEY §0).  Capabilities are enabled by the
checkpoints you pass; missing ones 404.

  python -m cross_modal_video_engine_tpu.cli.serve \
      --retrieval_checkpoint CKPT --rootpath R --collection C \
      --visual_feature F [--port 8765]
"""

from __future__ import annotations

import argparse

from ..service.app import EngineService, create_server


def _pow2_rows(rows, max_batch, min_batch=1):
    """Pad a request wave to the next power of two (>= min_batch) by
    repeating row 0 (one copy of the logic the four handlers share;
    shapes then depend only on the padded batch size so each jitted
    program compiles at most log2(max_batch)+1 times, ever).

    min_batch: the retrieval handler passes 8 — its wave cost is the
    bandwidth-bound index read, and a 1-row wave otherwise compiles to
    an M=1 GEMV against the index, which XLA lays out so badly the
    measured single-query search ran ~4x slower than a whole 8-row
    wave (bench_serve r5).  The compute-bound model routes keep the
    default 1 (padding THEIR single requests 8x-multiplies real
    tower FLOPs).  Returns (rows, n_real)."""
    from ..service.batching import _pad_pow2
    n = len(rows)
    padded = _pad_pow2(max(n, min_batch), max(n, max_batch, min_batch))
    return list(rows) + [rows[0]] * (padded - n), n


def build_retrieval_handler(args):
    import numpy as np
    from ..models.dual_encoding import make_text_batch
    from ..service.batching import MicroBatcher
    from .common import load_dataset, restore_dual_encoding
    from .retrieval_inference import build_video_index

    import jax
    model, state = restore_dual_encoding(args.retrieval_checkpoint)
    # commit params to the device ONCE: checkpoint params are host
    # numpy, and a jit argument that lives on host re-uploads per call
    # (~250 MB/query at production size — measured 2.6 s/query through
    # the relay before this line existed; bench_serve.py guards it)
    state["variables"] = jax.device_put(state["variables"])
    dataset = load_dataset(args.rootpath, args.collection,
                           args.visual_feature)
    index = build_video_index(model, state["variables"], dataset,
                              cache=args.index_cache,
                              dtype=getattr(args, "index_dtype", None),
                              capacity=getattr(args, "index_capacity", None))

    max_batch = getattr(args, "max_batch", 32)

    # the FULL query path — tokenized text -> tower -> index top-k — as
    # ONE compiled program per wave shape: the query embedding never
    # leaves the device, and a wave pays a single dispatch + a single
    # packed fetch (int32 ids bitcast beside the f32 scores) instead of
    # 2 dispatches + 3 fetches (~25 ms each through a relay; and even
    # co-located hosts pay ~10s of us per launch).  Weights/index ride
    # as jit ARGUMENTS (closures would inline them into the HLO).
    import functools
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def _wave(v, batch, emb, scales, valid, k):
        q = model.apply(v, batch, method="embed_txt_distill")
        qn = q / jnp.maximum(
            jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        vals, idx = index.searcher()(emb, scales, valid, qn, k)
        return jnp.concatenate(
            [vals, jax.lax.bitcast_convert_type(idx, jnp.float32)], axis=1)

    def query_rows(rows):
        # rows: [(ids, bow, k)] (the r4 handler searched per request
        # after a coalesced embed, so a 64-request wave paid 64
        # serialized search dispatches).  make_text_batch pads to
        # max_words so shapes depend only on the (pow2-padded) batch
        # size; the search k is the wave max, pow2-padded, so the
        # program compiles O(log batch * log k) times, ever.
        rows, n = _pow2_rows(rows, max_batch, min_batch=8)
        batch = make_text_batch(
            [ids[: dataset.max_words] for ids, _, _ in rows],
            np.stack([bow for _, bow, _ in rows]), dataset.max_words)
        k_wave = max(k for _, _, k in rows[:n])
        k_wave = max(16, 1 << (k_wave - 1).bit_length())
        k_wave = min(k_wave, index.n_active)   # as index.search caps
        packed = np.asarray(_wave(state["variables"], batch, index.emb,
                                  index.scales, index.valid, k_wave))
        scores = packed[:, :k_wave]
        idx = np.ascontiguousarray(packed[:, k_wave:]).view(np.int32)
        ids_out = [[index.ids[j] for j in row] for row in idx]
        return [(scores[i], ids_out[i]) for i in range(n)]

    batcher = MicroBatcher(query_rows, max_batch=max_batch,
                           max_wait_ms=getattr(args, "max_wait_ms", 5.0),
                           name="retrieval-query")

    def handler(payload: dict) -> dict:
        bow, ids = dataset.process_cap(payload["query"])
        k = int(payload.get("topK", 10))
        scores, vids = batcher.submit((ids, bow, k))
        return {"results": [
            {"video": v, "score": float(s)}
            for v, s in zip(vids[:k], scores[:k])]}

    handler.batcher = batcher
    return handler


def build_caption_handler(args):
    """Decode on the host per request; coalesce the decoder forward
    across concurrent requests (forward_test natively handles
    (B*num_segs, ...) batches)."""
    import jax.numpy as jnp
    import numpy as np
    from ..data.pipelines import build_pipeline
    from ..models.decoder_head import RNNDecoderConfig
    from ..models.recognizer import Recognizer3DRelseq
    from ..models.timesformer import TimeSformerConfig
    from ..service.batching import MicroBatcher
    from ..train.checkpoint import load_checkpoint
    from .caption_inference import DEFAULT_PIPELINE

    variables, cfg_d, _ = load_checkpoint(args.caption_checkpoint)
    from ..utils.precision import maybe_cast_bf16
    variables = maybe_cast_bf16(variables, cfg_d)  # torch .half() analogue
    import jax as _jax
    variables = _jax.device_put(variables)      # commit once, not per call
    ts = TimeSformerConfig(**{k: tuple(v) if isinstance(v, list) else v
                              for k, v in cfg_d["backbone"].items()})
    model = Recognizer3DRelseq(ts, RNNDecoderConfig(**cfg_d["decoder"]))
    pipe = build_pipeline(DEFAULT_PIPELINE)

    import jax
    fwd = jax.jit(lambda v, x, s: model.apply(v, x, num_segs=s,
                                              method="forward_test"),
                  static_argnums=(2,))   # compiled once per wave shape
    cap_max_batch = getattr(args, "max_batch", 8)

    def model_rows(rows):
        # rows: (num_clips, T, H, W, C) float arrays, same shape
        num_segs = rows[0].shape[0]
        rows, n = _pow2_rows(rows, cap_max_batch)
        batch = jnp.asarray(np.concatenate(rows, axis=0))
        probs = np.asarray(fwd(variables, batch, num_segs))
        return [probs[i] for i in range(n)]

    batcher = MicroBatcher(model_rows,
                           max_batch=cap_max_batch,
                           max_wait_ms=getattr(args, "max_wait_ms", 5.0),
                           name="caption-model")

    def handler(payload: dict) -> dict:
        r = pipe({"filename": payload["video"], "start_index": 0})
        clips = np.asarray(r["imgs"], np.float32)
        probs = batcher.submit(clips)                 # (max_len, C)
        threshold = float(payload.get("threshold", 0.5))
        steps = [list(np.nonzero(p > threshold)[0]) for p in probs]
        return {"steps": [[int(i) for i in s] for s in steps]}

    handler.batcher = batcher
    return handler


def build_composed_handler(args):
    """Composed text+video retrieval over a directory index (the
    inference.py:119-150 flow behind one POST)."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from ..models.clip import (CLIPConfig, CLIPModel,
                           enable_fused_inference)
    from ..models.combiner import Combiner, CombinerConfig
    from ..train.checkpoint import load_checkpoint
    from ..utils.bpe import BPETokenizer
    from .composed_inference import (extract_video_features,
                                     build_combiner_inputs)

    clip_vars, clip_cfg_d, _ = load_checkpoint(args.clip_checkpoint)
    if "patch_size" in clip_cfg_d:
        clip_cfg = enable_fused_inference(
            CLIPConfig(**clip_cfg_d))   # TPU: headline fused program
        clip_model = CLIPModel(clip_cfg)
    else:
        from ..models.clip_resnet import CLIPResNetConfig, CLIPResNetModel
        clip_cfg_d["vision_layers"] = tuple(clip_cfg_d["vision_layers"])
        clip_cfg = CLIPResNetConfig(**clip_cfg_d)
        clip_model = CLIPResNetModel(clip_cfg)
    comb_vars, comb_cfg_d, _ = load_checkpoint(args.combiner_checkpoint)
    comb_cfg = CombinerConfig(**comb_cfg_d)
    combiner = Combiner(comb_cfg)
    tok = BPETokenizer(args.merges)
    import jax as _jax
    clip_vars = _jax.device_put(clip_vars)      # commit once, not per call
    comb_vars = _jax.device_put(comb_vars)

    names = sorted(f for f in os.listdir(args.videos_dir)
                   if f.split(".")[-1].lower() in ("mp4", "avi", "mkv",
                                                   "webm", "mov"))
    feature_cache = getattr(args, "feature_cache", None)
    index_high = []
    for name in names:
        # the same per-video npz cache composed_inference uses — a
        # server restart must not re-decode + re-encode the corpus
        cache = (os.path.join(feature_cache, name + ".npz")
                 if feature_cache else None)
        if cache and os.path.exists(cache):
            h = np.load(cache)["high_feature"]
        else:
            h, m = extract_video_features(
                clip_model, clip_vars, os.path.join(args.videos_dir, name),
                dim=clip_cfg.image_resolution)
            if cache:
                os.makedirs(feature_cache, exist_ok=True)
                from ..data.composed_dataset import save_video_features
                save_video_features(cache, h, m)
        hh, _ = build_combiner_inputs(h, np.zeros((1, 1, h.shape[-1]),
                                                  np.float32))
        index_high.append(hh)
    index_high = np.stack(index_high)

    from ..service.batching import MicroBatcher

    # pre-normalized target index (rank_index recomputes this per call;
    # hoist it so the batched stage is one matmul)
    index = index_high.mean(axis=1)
    index = index / np.maximum(
        np.linalg.norm(index, axis=1, keepdims=True), 1e-12)

    import jax

    # compiled once; all weights + the index ride as arguments (eager
    # .apply would re-trace per wave; a closed-over index would inline
    # into the HLO)
    @jax.jit
    def _rank(cv, cbv, highs, middles, ids, idx):
        text_feat = clip_model.apply(cv, ids, method="encode_text")
        pred = combiner.apply(cbv, (highs, middles), text_feat,
                              method="combine_features")
        return 1.0 - pred @ idx.T                      # distances

    comp_max_batch = getattr(args, "max_batch", 8)
    index_j = jnp.asarray(index)

    def rank_rows(rows):
        # rows: (ref_high (F, D), ref_middle (F, L, D), token_ids (S,))
        # -> one encode_text + one combine + one index matmul for the
        # whole wave
        rows, n = _pow2_rows(rows, comp_max_batch)
        highs = jnp.asarray(np.stack([r[0] for r in rows]))
        middles = jnp.asarray(np.stack([r[1] for r in rows]))
        ids = jnp.asarray(np.concatenate([r[2] for r in rows]))  # (B, S)
        scores = np.asarray(_rank(clip_vars, comb_vars, highs, middles,
                                  ids, index_j))
        order = np.argsort(scores, axis=1)
        return [order[i] for i in range(n)]

    batcher = MicroBatcher(rank_rows,
                           max_batch=comp_max_batch,
                           max_wait_ms=getattr(args, "max_wait_ms", 5.0),
                           name="composed-rank")

    def handler(payload: dict) -> dict:
        rh, rm = extract_video_features(clip_model, clip_vars,
                                        payload["reference_video"],
                                        dim=clip_cfg.image_resolution)
        ref_high, ref_middle = build_combiner_inputs(
            rh, rm, dim=comb_cfg.clip_feature_dim)
        ids = np.asarray(tok.tokenize(payload["text"],
                                      clip_cfg.context_length))
        order = batcher.submit((ref_high, ref_middle, ids))
        k = int(payload.get("topK", 1))
        return {"results": [names[i] for i in order[:k]]}

    handler.batcher = batcher
    return handler


def build_explain_handler(args):
    """Explainable recognition (the inference_demo.py flow behind one
    POST): classify, gradient-probe the target layer, score concept
    banks."""
    import json
    import numpy as np
    import jax.numpy as jnp
    from ..data.pipelines import build_pipeline
    from ..explain.pipeline import explain_video
    from ..models.recognizer import Recognizer3D
    from ..models.timesformer import TimeSformerConfig
    from ..train.checkpoint import load_checkpoint
    from .caption_inference import DEFAULT_PIPELINE
    from .explain_demo import load_concept_banks

    variables, cfg_d, _ = load_checkpoint(args.explain_checkpoint)
    from ..utils.precision import maybe_cast_bf16
    variables = maybe_cast_bf16(variables, cfg_d)
    import jax as _jax
    variables = _jax.device_put(variables)      # commit once, not per call
    ts_cfg = TimeSformerConfig(**{k: tuple(v) if isinstance(v, list) else v
                                  for k, v in cfg_d["backbone"].items()})
    model = Recognizer3D(ts_cfg, num_classes=cfg_d["num_classes"])
    banks = (load_concept_banks(args.concept_banks)
             if args.concept_banks else {})
    label_names = (json.load(open(args.label_names))
                   if args.label_names else None)
    pipe = build_pipeline(DEFAULT_PIPELINE)

    from ..explain.ctv import concept_scores, top_concepts
    from ..explain.grads import grad_extract, normalized_cls_grad
    from ..service.batching import MicroBatcher

    default_layer = args.target_layer

    def grad_rows(rows):
        # rows: (num_clips, T, H, W, 3), same shape; the forward+grad
        # pass batches every request's clips into one program, then
        # per-request slices feed the (host-side) concept scoring
        k = rows[0].shape[0]
        rows, n = _pow2_rows(rows, getattr(args, "max_batch", 8))
        batch = jnp.asarray(np.concatenate(rows, axis=0))
        g = grad_extract(model, variables, batch, [default_layer])
        grads = np.asarray(g["gradients"][default_layer])
        preds = np.asarray(g["pred"])
        scores = np.asarray(g["scores"])
        return [dict(pred=preds[i * k: (i + 1) * k],
                     scores=scores[i * k: (i + 1) * k],
                     grad_probe=normalized_cls_grad(
                         grads[i * k: (i + 1) * k]))
                for i in range(n)]

    batcher = MicroBatcher(grad_rows,
                           max_batch=getattr(args, "max_batch", 8),
                           max_wait_ms=getattr(args, "max_wait_ms", 5.0),
                           name="explain-grad")

    def handler(payload: dict) -> dict:
        r = pipe({"filename": payload["video"], "start_index": 0})
        clips = np.asarray(r["imgs"], np.float32)
        layer = int(payload.get("target_layer", default_layer))
        topk = int(payload.get("topK", 5))
        if layer == default_layer:
            out = batcher.submit(clips)
            for level, bank in banks.items():
                s = concept_scores(bank.matrix, out["grad_probe"])
                out[f"{level}_top"] = top_concepts(s, bank.names, topk)
        else:       # custom layer: un-batched fallback path
            out = explain_video(model, variables, jnp.asarray(clips),
                                target_layer=layer, concept_banks=banks,
                                topk=topk)
        pred = int(out["pred"][0])
        resp = {
            "prediction": label_names[pred] if label_names else pred,
            "scores": [float(s) for s in np.asarray(out["scores"][0])],
        }
        for level in banks:
            resp[f"{level}_top"] = [
                {"concept": n, "score": float(s)}
                for n, s in out[f"{level}_top"]]
        return resp

    handler.batcher = batcher
    return handler


def build_service(args) -> EngineService:
    """Register every capability whose checkpoints were provided."""
    service = EngineService()
    if getattr(args, "retrieval_checkpoint", None):
        service.register("retrieval", build_retrieval_handler(args))
    if getattr(args, "caption_checkpoint", None):
        service.register("caption", build_caption_handler(args))
    if (getattr(args, "clip_checkpoint", None)
            and getattr(args, "combiner_checkpoint", None)):
        service.register("composed_retrieval", build_composed_handler(args))
    if getattr(args, "explain_checkpoint", None):
        service.register("explain", build_explain_handler(args))
    return service


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--retrieval_checkpoint")
    parser.add_argument("--rootpath")
    parser.add_argument("--collection")
    parser.add_argument("--visual_feature")
    parser.add_argument("--index_cache", default=None)
    parser.add_argument("--index_dtype", default=None,
                        choices=("float32", "bfloat16", "int8"),
                        help="stored-row precision; bfloat16/int8 are "
                             "the low-HBM serving modes (int8 trades "
                             "exactness for ~2x bandwidth, see "
                             "docs/PERF.md)")
    parser.add_argument("--index_capacity", type=int, default=None,
                        help="index slot count (default 2x rows for "
                             "incremental-add headroom; set to the row "
                             "count for a frozen corpus to halve index "
                             "HBM)")
    parser.add_argument("--caption_checkpoint")
    # composed retrieval
    parser.add_argument("--clip_checkpoint")
    parser.add_argument("--combiner_checkpoint")
    parser.add_argument("--videos_dir")
    parser.add_argument("--merges")
    parser.add_argument("--feature_cache", default=None,
                        help="per-video npz cache dir shared with "
                             "composed_inference (skips re-encoding "
                             "the corpus on restart)")
    # explain
    parser.add_argument("--explain_checkpoint")
    parser.add_argument("--concept_banks", default=None)
    parser.add_argument("--target_layer", type=int, default=10)
    parser.add_argument("--label_names", default=None)
    parser.add_argument("--demo", action="store_true",
                        help="also serve the static demo UI at /demo "
                             "(live Video-engine-web equivalent)")
    args = parser.parse_args(argv)

    service = build_service(args)
    from ..service.app import DEMO_DIR
    server = create_server(service, args.host, args.port,
                           demo_dir=DEMO_DIR if args.demo else None)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"routes={sorted(service.handlers)}"
          + (" demo=/demo" if args.demo else ""))
    server.serve_forever()


if __name__ == "__main__":
    main()
