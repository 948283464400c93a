"""Offline recognition evaluation CLI (MCT tools/test.py equivalent).

Evaluates a trained checkpoint over a dataset and reports
top_k_accuracy / mean_class_accuracy (the MCT `--eval` metrics), dumping
per-sample scores like tools/test.py --out.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import VideoDataset
from ..data.pipelines import build_pipeline
from ..metrics.accuracy import mean_class_accuracy, top_k_accuracy
from .common import restore_dual_encoding  # noqa: F401 (CLI symmetry)
from ..api import init_recognizer


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", default=None, help="npz of scores")
    parser.add_argument("--eval", nargs="*",
                        default=["top_k_accuracy", "mean_class_accuracy"])
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    model, variables, _ = init_recognizer(args.checkpoint)
    pipe = build_pipeline(cfg["data.pipeline"])
    ds = VideoDataset(cfg["data.val.ann_file"], pipe,
                      cfg.get("data.val.data_prefix"))
    bs = cfg.get("data.videos_per_gpu", 8)

    # multi-clip test protocol (tools/test.py): fold every clip into
    # the batch and average per video via forward_test(num_segs) —
    # scoring clip 0 only would silently change the reported accuracy
    fn = jax.jit(lambda p, v, s: model.apply(p, v, num_segs=s,
                                             method="forward_test"),
                 static_argnums=(2,))
    scores, labels = [], []
    for imgs, items, n in ds.batches(bs):
        B, n_clips = imgs.shape[:2]
        clips = jnp.asarray(
            imgs.reshape((B * n_clips,) + imgs.shape[2:]).astype(
                np.float32))
        s = np.asarray(fn(variables, clips, n_clips))[:n]
        scores.extend(list(s))
        labels.extend(int(it["label"]) for it in items[:n])

    report = {}
    if "top_k_accuracy" in args.eval:
        k = min(5, scores[0].shape[0])
        top1, topk = top_k_accuracy(scores, labels, (1, k))
        report["top1_acc"] = top1
        report[f"top{k}_acc"] = topk
    if "mean_class_accuracy" in args.eval:
        report["mean_class_accuracy"] = mean_class_accuracy(scores, labels)
    if args.out:
        np.savez(args.out, scores=np.stack(scores),
                 labels=np.asarray(labels))
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
