"""Config-driven temporal-localization training CLI (the localization
half of MCT tools/train.py + tools/test.py).

Trains BMN (or the BSN TEM) over an ActivityNet-style feature dataset,
then evaluates proposals with AR@AN/AUC — the reference's
`--eval AR@AN` flow.

Config (unified Config format):

    model = dict(type='BMN', temporal_dim=100, feat_dim=400, ...)
    data = dict(
        train=dict(ann_file='train.json', feature_prefix='feats/'),
        val=dict(ann_file='val.json', feature_prefix='feats/'))
    optimizer = dict(learning_rate=1e-3)
    total_epochs = 9
    batch_size = 8

  python -m cross_modal_video_engine_tpu.cli.localization_train CONFIG \\
      --work_dir W [--cfg-options ...]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.datasets_extra import ActivityNetDataset
from ..metrics.proposals import average_recall_at_avg_proposals
from ..models.bmn import BMN, BMNConfig, generate_proposals, soft_nms
from ..models.bsn import TEM
from ..train.checkpoint import save_checkpoint
from ..train.localization_trainer import (bm_mask, bmn_labels,
                                          bsn_tem_labels,
                                          make_bmn_train_step,
                                          make_bsn_tem_train_step)


def _batches(ds: ActivityNetDataset, batch_size: int, order=None):
    """Yields (items, n_real): the tail batch pads by repeating its
    first item (static shapes — a ragged tail would compile a second
    XLA program for both the train step and the eval forward)."""
    order = range(len(ds)) if order is None else order
    buf = []
    for i in order:
        buf.append(ds[i])
        if len(buf) == batch_size:
            yield buf, batch_size
            buf = []
    if buf:
        n = len(buf)
        while len(buf) < batch_size:
            buf.append(buf[0])
        yield buf, n


def evaluate_bmn_proposals(model, params, ds: ActivityNetDataset,
                           batch_size: int = 8, top_k: int = 100):
    """Inference + score fusion + soft-NMS per video, then AR@AN/AUC
    (reference tools/test.py --eval AR@AN)."""
    fn = jax.jit(lambda p, f: model.apply({"params": p}, f))
    gt, props, total = {}, {}, 0
    for batch, n_real in _batches(ds, batch_size):
        feats = jnp.asarray(np.stack([b["features"] for b in batch]))
        out = fn(params, feats)
        for j, b in enumerate(batch[:n_real]):
            rows = generate_proposals(
                np.asarray(out["tem_start"][j]),
                np.asarray(out["tem_end"][j]),
                np.asarray(out["pem_reg"][j]),
                np.asarray(out["pem_cls"][j]), max_proposals=top_k * 4)
            rows = soft_nms(rows, top_k=top_k)
            T = out["tem_start"].shape[1]
            rows[:, :2] = rows[:, :2] * b["duration"] / T
            gt[b["video"]] = b["segments"] * b["duration"]
            props[b["video"]] = rows
            total += len(rows)
    recall, avg_recall, ppv, auc = average_recall_at_avg_proposals(
        gt, props, total_num_proposals=total, max_avg_proposals=top_k)
    an = {f"AR@{n}": float(avg_recall[min(n, len(avg_recall)) - 1])
          for n in (1, 5, 10, 100)}
    return {"auc": float(auc), **an}


def train_from_config(cfg: Config, work_dir: str,
                      num_epochs: int | None = None):
    mcfg = dict(cfg["model"])
    mtype = mcfg.pop("type", "BMN")
    bs = cfg.get("batch_size", 8)
    lr = cfg.get("optimizer.learning_rate", 1e-3)
    epochs = num_epochs or cfg.get("total_epochs", 9)
    tx = optax.adam(lr)
    rng = jax.random.key(0)

    if mtype == "BMN":
        bcfg = BMNConfig(**mcfg)
        model = BMN(bcfg)
        T = bcfg.temporal_dim
        train_ds = ActivityNetDataset(cfg["data.train.ann_file"],
                                      cfg["data.train.feature_prefix"], T)
        val_ds = ActivityNetDataset(cfg["data.val.ann_file"],
                                    cfg["data.val.feature_prefix"], T)
        mask = jnp.asarray(bm_mask(T, bcfg.max_duration))
        params = model.init(
            jax.random.key(0),
            jnp.zeros((1, T, bcfg.feat_dim), jnp.float32))["params"]
        opt_state = tx.init(params)
        step = make_bmn_train_step(model, tx)
        history = []
        for epoch in range(epochs):
            order = np.random.default_rng(epoch).permutation(len(train_ds))
            losses = []
            for batch, _n in _batches(train_ds, bs, order):
                feats = jnp.asarray(np.stack([b["features"]
                                              for b in batch]))
                labels = [bmn_labels(b["segments"], T, bcfg.max_duration)
                          for b in batch]
                gt_iou = jnp.asarray(np.stack([l[0] for l in labels]))
                gt_s = jnp.asarray(np.stack([l[1] for l in labels]))
                gt_e = jnp.asarray(np.stack([l[2] for l in labels]))
                m = jnp.broadcast_to(mask, gt_iou.shape)
                rng, sub = jax.random.split(rng)
                params, opt_state, logs = step(
                    params, opt_state, feats, gt_iou, gt_s, gt_e, m, sub)
                losses.append(float(logs["loss"]))
            rec = {"epoch": epoch, "loss": float(np.mean(losses))}
            history.append(rec)
            print(json.dumps(rec))
        report = evaluate_bmn_proposals(model, params, val_ds, bs)
        save_checkpoint(os.path.join(work_dir, "bmn_final"),
                        {"params": params}, bcfg, report)
        print(json.dumps(report))
        return {"params": params}, history, report

    if mtype == "TEM":
        model = TEM(hidden=mcfg.get("hidden", 512))
        T = mcfg.get("temporal_dim", 100)
        train_ds = ActivityNetDataset(cfg["data.train.ann_file"],
                                      cfg["data.train.feature_prefix"], T)
        params = model.init(
            jax.random.key(0),
            jnp.zeros((1, T, mcfg.get("feat_dim", 400)),
                      jnp.float32))["params"]
        opt_state = tx.init(params)
        step = make_bsn_tem_train_step(model, tx)
        history = []
        for epoch in range(epochs):
            losses = []
            for batch, _n in _batches(train_ds, bs):
                feats = jnp.asarray(np.stack([b["features"]
                                              for b in batch]))
                labels = [bsn_tem_labels(b["segments"], T) for b in batch]
                a = jnp.asarray(np.stack([l[0] for l in labels]))
                s = jnp.asarray(np.stack([l[1] for l in labels]))
                e = jnp.asarray(np.stack([l[2] for l in labels]))
                params, opt_state, logs = step(params, opt_state, feats,
                                               a, s, e)
                losses.append(float(logs["loss"]))
            rec = {"epoch": epoch, "loss": float(np.mean(losses))}
            history.append(rec)
            print(json.dumps(rec))
        save_checkpoint(os.path.join(work_dir, "tem_final"),
                        {"params": params}, None, {})
        return {"params": params}, history, {}

    raise ValueError(f"unknown localization model type {mtype}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--work_dir", required=True)
    parser.add_argument("--total_epochs", type=int, default=None)
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    os.makedirs(args.work_dir, exist_ok=True)
    _, history, report = train_from_config(cfg, args.work_dir,
                                           args.total_epochs)
    return history, report


if __name__ == "__main__":
    main()
