"""Composed-retrieval validation CLI.

Parity surface for MultiFusion/src/validate.py:27-143
(`compute_cirr_val_metrics`): build index features from the dataset's
videos (frame-mean + normalize), predict fused features for every
relative-mode triplet, mask each query's reference video out of the
ranking, report recall@1/5/10/50, and dump the top-100 ranking
(`results_wo_attn.npy` analogue).
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from ..data.composed_dataset import ComposedVideoDataset, FeatureStore
from ..models.clip import (CLIPConfig, CLIPModel,
                           enable_fused_inference)
from ..models.combiner import Combiner, CombinerConfig
from ..train.checkpoint import load_checkpoint
from ..train.combiner_trainer import composed_rank_eval
from ..utils.bpe import BPETokenizer
from .combiner_trainer import build_index_features, encode_texts


def validate(combiner, comb_vars, dataset, text_encode_fn,
             batch_size: int = 64):
    index_high = jnp.asarray(build_index_features(dataset))
    all_orders, gts = [], []
    n_total = 0
    for batch in dataset.batches(batch_size):
        n = batch["n_valid"]
        text = text_encode_fn(batch["captions"])
        order, _ = composed_rank_eval(
            combiner, comb_vars["params"],
            (jnp.asarray(batch["ref_high"]), jnp.asarray(batch["ref_middle"])),
            text, index_high,
            jnp.asarray(batch["ref_rows"]), jnp.asarray(batch["target_rows"]),
            top_k=100)   # the reference dumps the top-100 ranking
        all_orders.append(order[:n])
        gts.extend(batch["target_rows"][:n])
        n_total += n
    order = np.concatenate(all_orders)
    gts = np.asarray(gts)
    hits = order == gts[:, None]
    report = {}
    for k in (1, 5, 10, 50):
        kk = min(k, order.shape[1])
        report[f"recall_at{k}"] = float(hits[:, :kk].any(1).mean() * 100)
    report["n_queries"] = int(n_total)
    return order, report


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--triplets", required=True)
    parser.add_argument("--features_root", required=True)
    parser.add_argument("--id2name", default=None)
    parser.add_argument("--clip_checkpoint", required=True)
    parser.add_argument("--combiner_checkpoint", required=True)
    parser.add_argument("--merges", required=True)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--output", default=None,
                        help="npy path for the top-100 ranking")
    args = parser.parse_args(argv)

    clip_vars, clip_cfg_d, _ = load_checkpoint(args.clip_checkpoint)
    clip_cfg = enable_fused_inference(
        CLIPConfig(**clip_cfg_d))   # TPU: headline fused program
    clip_model = CLIPModel(clip_cfg)
    tok = BPETokenizer(args.merges)
    comb_vars, comb_cfg_d, _ = load_checkpoint(args.combiner_checkpoint)
    if not comb_cfg_d:
        raise ValueError(
            f"{args.combiner_checkpoint} has no CombinerConfig — "
            "re-save with the config (combiner_trainer now embeds it); "
            "rebuilding from defaults would silently mismatch")
    combiner = Combiner(CombinerConfig(**comb_cfg_d))

    dataset = ComposedVideoDataset(
        args.triplets, FeatureStore({"main": args.features_root}),
        args.id2name)
    text_fn = lambda caps: encode_texts(clip_model, clip_vars, tok, caps,
                                        clip_cfg.context_length)
    order, report = validate(combiner, comb_vars, dataset, text_fn,
                             args.batch_size)
    if args.output:
        np.save(args.output, order[:, :100])
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
