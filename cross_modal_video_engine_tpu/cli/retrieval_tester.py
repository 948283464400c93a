"""Test-split evaluation CLI.

Parity surface for LINAS-engine/tester.py:41-141 + validate.py:15-90:
encodes the test split's videos and captions, computes the full error
matrix, writes it (`pred_errors_matrix.npz`, the reference writes
pred_errors_matrix.pth.tar) and prints R@K / medr / meanr / mAP in both
directions plus rsum.
"""

from __future__ import annotations

import argparse
import functools
import json
import os

import jax
import numpy as np

from ..metrics.retrieval import cal_perf, get_gt
from ..retrieval.index import RetrievalIndex
from .common import load_dataset, restore_dual_encoding
from .retrieval_inference import build_video_index


@functools.lru_cache(maxsize=4)
def _embed_txt_fn(model):
    """One compiled text embedder per model; variables ride as an
    ARGUMENT (a per-call closure would inline the params into the HLO
    — rejected >~100MB by the remote compile service — and recompile on
    every epoch-end evaluate())."""
    return jax.jit(lambda v, t: model.apply(v, t,
                                            method="embed_txt_distill"))


def evaluate(model, variables, dataset, batch_size: int = 64):
    index = build_video_index(model, variables, dataset, batch_size)
    embed_txt = _embed_txt_fn(model)
    cap_chunks = []
    for batch, n in dataset.text_batches(batch_size):
        cap_chunks.append(np.asarray(embed_txt(variables, batch))[:n])
    cap_emb = np.concatenate(cap_chunks, axis=0)

    errors = index.full_errors(cap_emb)   # (n_captions, n_videos)
    v2t_gt, t2v_gt = get_gt(dataset.video_ids, dataset.cap_ids)
    (t2v_r, v2t_r, t2v_map_score, v2t_map_score) = cal_perf(
        errors, v2t_gt, t2v_gt)
    report = {
        "t2v": {"r1": t2v_r[0], "r5": t2v_r[1], "r10": t2v_r[2],
                "medr": t2v_r[3], "meanr": t2v_r[4], "map": t2v_map_score},
        "v2t": {"r1": v2t_r[0], "r5": v2t_r[1], "r10": v2t_r[2],
                "medr": v2t_r[3], "meanr": v2t_r[4], "map": v2t_map_score},
        "rsum": sum(t2v_r[:3]) + sum(v2t_r[:3]),
    }
    return errors, report


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--rootpath", required=True)
    parser.add_argument("--testCollection", required=True)
    parser.add_argument("--visual_feature", required=True)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--output_dir", default=None)
    args = parser.parse_args(argv)

    model, state = restore_dual_encoding(args.checkpoint)
    dataset = load_dataset(args.rootpath, args.testCollection,
                           args.visual_feature)
    errors, report = evaluate(model, state["variables"], dataset,
                              args.batch_size)

    out_dir = args.output_dir or args.checkpoint
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "pred_errors_matrix.npz"), errors=errors,
             video_ids=np.array(dataset.video_ids),
             cap_ids=np.array(dataset.cap_ids))
    with open(os.path.join(out_dir, "test_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
