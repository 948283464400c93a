"""Combiner training CLI (MultiFusion combiner_train.py equivalent).

Trains the fusion head over a ComposedVideoDataset with the CLIP towers
frozen: video features precomputed (h5/npz store), modification text
encoded once per epoch batch by the frozen text tower.  Validates every
`validation_frequency` epochs with reference-video masking and keeps the
best checkpoint by arithmetic-mean recall (combiner_train.py:427-438).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.composed_dataset import ComposedVideoDataset, FeatureStore
from ..models.clip import (CLIPConfig, CLIPModel,
                           enable_fused_inference)
from ..models.combiner import Combiner, CombinerConfig
from ..train.checkpoint import best_checkpoint_manager, load_checkpoint
from ..train.combiner_trainer import (
    CombinerTrainConfig, composed_rank_eval, init_combiner_state,
    make_combiner_optimizer, make_combiner_train_step)
from ..utils.bpe import BPETokenizer


def encode_texts(clip_model, clip_vars, tok, captions, context_length):
    ids = jnp.asarray(tok.tokenize(list(captions), context_length))
    return clip_model.apply(clip_vars, ids, method="encode_text")


def build_index_features(dataset: ComposedVideoDataset) -> np.ndarray:
    """(n_videos, F, D) high features in video_names order."""
    out = []
    for name in dataset.video_names:
        high, _ = dataset._features(name)
        out.append(high)
    return np.stack(out)


def train_combiner(combiner: Combiner, dataset: ComposedVideoDataset,
                   text_encode_fn, train_cfg: CombinerTrainConfig,
                   out_dir: str, batch_size: int = 32, seed: int = 0,
                   num_epochs: Optional[int] = None,
                   val_dataset: Optional[ComposedVideoDataset] = None):
    tx = make_combiner_optimizer(train_cfg)
    first = next(dataset.batches(batch_size))
    text0 = text_encode_fn(first["captions"])
    state = init_combiner_state(
        combiner, tx,
        (jnp.asarray(first["ref_high"]), jnp.asarray(first["ref_middle"])),
        text0,
        (jnp.asarray(first["target_high"]), jnp.asarray(first["target_middle"])),
        seed)
    step = make_combiner_train_step(combiner, tx)
    save_best = best_checkpoint_manager(out_dir)
    rng = jax.random.key(seed)
    history = []
    val_ds = val_dataset or dataset
    index_high = jnp.asarray(build_index_features(val_ds))

    for epoch in range(num_epochs or train_cfg.num_epochs):
        losses = []
        for batch in dataset.batches(batch_size, shuffle=True,
                                     seed=seed + epoch):
            rng, sub = jax.random.split(rng)
            text = text_encode_fn(batch["captions"])
            state, loss = step(
                state,
                (jnp.asarray(batch["ref_high"]),
                 jnp.asarray(batch["ref_middle"])),
                text,
                (jnp.asarray(batch["target_high"]),
                 jnp.asarray(batch["target_middle"])), sub)
            losses.append(float(loss))
        rec = {"epoch": epoch, "loss": float(np.mean(losses))}
        if epoch % train_cfg.validation_frequency == 0:
            # full validation split (the reference validates the whole
            # split, combiner_train.py:427-438 — one fixed batch was a
            # noisy ~1% sample and could keep a far-from-best ckpt)
            hits = {k: [] for k in (1, 5, 10, 50)}
            for val in val_ds.batches(batch_size):
                nv = val["n_valid"]
                text = text_encode_fn(val["captions"])
                order, _ = composed_rank_eval(
                    combiner, state.params,
                    (jnp.asarray(val["ref_high"]),
                     jnp.asarray(val["ref_middle"])),
                    text, index_high,
                    jnp.asarray(val["ref_rows"]),
                    jnp.asarray(val["target_rows"]))
                h = order[:nv] == np.asarray(val["target_rows"])[:nv, None]
                for k in hits:
                    hits[k].extend(h[:, : min(k, h.shape[1])].any(1))
            metrics = {f"recall_at{k}": float(np.mean(v) * 100)
                       for k, v in hits.items()}
            rec.update(metrics)
            mean_recall = float(np.mean(list(metrics.values())))
            rec["mean_recall"] = mean_recall
            # persist the CombinerConfig: composed_validate rebuilds
            # the model from this checkpoint's config dict
            save_best({"params": state.params},
                      dataclasses.asdict(combiner.cfg), mean_recall,
                      {"epoch": epoch, **metrics})
        history.append(rec)
        print(json.dumps(rec))
    return state, history


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--triplets", required=True)
    parser.add_argument("--features_root", required=True)
    parser.add_argument("--id2name", default=None)
    parser.add_argument("--clip_checkpoint", required=True)
    parser.add_argument("--merges", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--num_epochs", type=int, default=30)
    parser.add_argument("--learning_rate", type=float, default=2e-5)
    parser.add_argument("--projection_dim", type=int, default=2560)
    parser.add_argument("--hidden_dim", type=int, default=5120)
    args = parser.parse_args(argv)

    clip_vars, clip_cfg_d, _ = load_checkpoint(args.clip_checkpoint)
    # frozen towers: the fused Pallas program is a pure forward win on
    # TPU (+24% text embed, docs/PERF.md) with an identical param tree
    clip_cfg = enable_fused_inference(CLIPConfig(**clip_cfg_d))
    clip_model = CLIPModel(clip_cfg)
    tok = BPETokenizer(args.merges)

    store = FeatureStore({"main": args.features_root})
    dataset = ComposedVideoDataset(args.triplets, store, args.id2name)

    comb_cfg = CombinerConfig(clip_feature_dim=clip_cfg.embed_dim,
                              projection_dim=args.projection_dim,
                              hidden_dim=args.hidden_dim)
    combiner = Combiner(comb_cfg)
    tcfg = CombinerTrainConfig(learning_rate=args.learning_rate,
                               num_epochs=args.num_epochs)
    os.makedirs(args.out_dir, exist_ok=True)
    text_fn = lambda caps: encode_texts(clip_model, clip_vars, tok, caps,
                                        clip_cfg.context_length)
    state, history = train_combiner(combiner, dataset, text_fn, tcfg,
                                    args.out_dir, args.batch_size,
                                    num_epochs=args.num_epochs)
    return history


if __name__ == "__main__":
    main()
