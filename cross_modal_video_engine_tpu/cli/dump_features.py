"""Dataset-scale per-layer embedding / gradient dumps.

Equivalent of the reference concept-bank builders MCT/tools/
inference_batch.py (per-video layer embeddings via OutputHook) and
inference_grad.py (per-video layer gradients of the max-class score):
iterate a dataset with a trained recognizer, capture the requested layer
CLS features (crop/clip-averaged, inference_batch.py:40-52) and/or the
class-score gradients at those layers, and write one pickle mapping
video filename -> {layer: vector} — the file format the CTV tooling
consumes.

  python -m cross_modal_video_engine_tpu.cli.dump_features CONFIG \\
      --checkpoint CKPT --mode embeddings|grads|both \\
      --layers 0 5 11 --out feats.pkl

The whole batch's capture + per-layer gradients compile into ONE XLA
program (explain/grads.py), so corpus-scale dumps run at device speed
instead of the reference's per-video hook replays.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import VideoDataset
from ..data.pipelines import build_pipeline
from ..explain.grads import grad_extract
from ..api import init_recognizer


def dump_features(model, variables, dataset, layers, batch_size: int = 8,
                  mode: str = "embeddings", target_class=None):
    """Returns {video_name: {'pred': int, layer: vec, ('grad', layer): vec}}:
    CLS-token features averaged over clips/crops (inference_batch.py
    process_med_feats) and, for grads mode, the gradient CLS vectors."""
    layers = tuple(layers)
    out = {}

    emb_fn = None
    if mode in ("embeddings", "both"):
        emb_fn = jax.jit(lambda v, x: model.apply(
            v, x, layers, method="forward_with_capture"))

    for imgs, items, n in dataset.batches(batch_size):
        # (B, n_clips, T, H, W, C): fold clips into the batch, average after
        B, n_clips = imgs.shape[0], imgs.shape[1]
        clips = jnp.asarray(
            imgs.reshape((B * n_clips,) + imgs.shape[2:]).astype(np.float32))
        recs = [{} for _ in range(n)]
        if emb_fn is not None:
            scores, captured = emb_fn(variables, clips)
            preds = np.asarray(scores).reshape(B, n_clips, -1).mean(1)
            for i in range(n):
                recs[i]["pred"] = int(preds[i].argmax())
            for l in layers:
                cls = np.asarray(captured[l])[:, 0]          # CLS token
                cls = cls.reshape(B, n_clips, -1).mean(1)    # crop average
                for i in range(n):
                    recs[i][l] = cls[i].astype(np.float32)
        if mode in ("grads", "both"):
            g = grad_extract(model, variables, clips, layers,
                             target_class=target_class)
            for i in range(n):
                recs[i].setdefault("pred", int(
                    g["scores"].reshape(B, n_clips, -1).mean(1)[i].argmax()))
            for l in layers:
                gcls = g["gradients"][l][:, 0].reshape(B, n_clips, -1).mean(1)
                for i in range(n):
                    recs[i][("grad", l)] = gcls[i].astype(np.float32)
        for i in range(n):
            out[items[i]["filename"]] = recs[i]
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--mode", default="embeddings",
                        choices=["embeddings", "grads", "both"])
    parser.add_argument("--layers", type=int, nargs="+", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--split", default="val")
    parser.add_argument("--target_class", type=int, default=None)
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    model, variables, _ = init_recognizer(args.checkpoint)
    pipe = build_pipeline(cfg["data.pipeline"])
    ds = VideoDataset(cfg[f"data.{args.split}.ann_file"], pipe,
                      cfg.get(f"data.{args.split}.data_prefix"))
    bs = cfg.get("data.videos_per_gpu", 8)

    feats = dump_features(model, variables, ds, args.layers, bs, args.mode,
                          args.target_class)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(feats, f)
    print(json.dumps({"videos": len(feats), "layers": args.layers,
                      "mode": args.mode, "out": args.out}))
    return feats


if __name__ == "__main__":
    main()
