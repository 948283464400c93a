"""Config-driven temporal-localization training CLI (the localization
half of MCT tools/train.py + tools/test.py).

Routes all four localizer stages the reference's config zoo trains:
* BMN over ActivityNet-style features, evaluated with AR@AN/AUC;
* BSN TEM (stage 1) over the same features;
* BSN PEM (stage 3) over PGM proposal csv/npy artifacts
  (`cli.misc_tools bsn_pgm` is stage 2), with the reference's u-mask
  balanced loss and score-fusion + soft-NMS AR@AN eval
  (reference models/localizers/bsn.py:229-395);
* SSN over snippet features + a tag-style proposal file
  (reference models/localizers/ssn.py:11 + ssn_dataset.py sampler).

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
from ..data.datasets_extra import ActivityNetDataset, SSNDataset
from ..metrics.proposals import average_recall_at_avg_proposals
from ..models.bmn import BMN, BMNConfig, generate_proposals, soft_nms
from ..models.bsn import PEM, TEM
from ..models.ssn import SSNConfig, SSNHead, stpp_matrix
from ..train.checkpoint import save_checkpoint
from ..train.localization_trainer import (SSNSamplerConfig, bm_mask,
                                          bmn_labels, bsn_tem_labels,
                                          make_bmn_train_step,
                                          make_bsn_pem_train_step,
                                          make_bsn_tem_train_step,
                                          make_ssn_batch_train_step)


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
    opt_name = (cfg.get("optimizer.optimizer", None)
                or cfg.get("optimizer.type", "adam")).lower()
    wd = cfg.get("optimizer.weight_decay", 0.0)
    if opt_name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(lr, momentum=cfg.get("optimizer.momentum", 0.9)))
    elif opt_name == "adamw":
        tx = optax.adamw(lr, weight_decay=wd)
    else:
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

    if mtype == "PEM":
        return _train_pem(cfg, mcfg, work_dir, bs, tx, epochs)

    if mtype == "SSN":
        return _train_ssn(cfg, mcfg, work_dir, bs, tx, epochs)

    raise ValueError(f"unknown localization model type {mtype}")


def _load_pgm_videos(cfg: Config, split: str, top_k: int):
    """(video dicts, per-video LoadProposals results) for a split whose
    config block names ann_file + pgm_proposals_dir + pgm_features_dir
    (the bsn_pgm artifact layout)."""
    from ..data.pipelines_extra import LoadProposals

    ds = ActivityNetDataset(cfg[f"data.{split}.ann_file"],
                            feature_prefix="", temporal_dim=1)
    op = LoadProposals(
        top_k=top_k,
        pgm_proposals_dir=cfg[f"data.{split}.pgm_proposals_dir"],
        pgm_features_dir=cfg[f"data.{split}.pgm_features_dir"])
    return [(v, op({"video_name": v["video"]})) for v in ds.videos]


def _train_pem(cfg, mcfg, work_dir, bs, tx, epochs):
    """BSN stage 3: train the PEM scorer on PGM proposal features, then
    AR@AN over score-fused + soft-NMS'd val proposals (the reference's
    PEM forward_test, bsn.py:352-377)."""
    top_k = mcfg.get("top_k", 500)
    model = PEM(hidden=mcfg.get("hidden", 256),
                fc1_ratio=mcfg.get("fc1_ratio", 0.1),
                fc2_ratio=mcfg.get("fc2_ratio", 0.1))
    train = _load_pgm_videos(cfg, "train", top_k)
    feats = np.concatenate([r["bsp_feature"] for _, r in train])
    gt_iou = np.concatenate([r["reference_temporal_iou"] for _, r in train])
    rows_per_step = bs * top_k

    params = model.init(jax.random.key(0),
                        jnp.zeros((1, feats.shape[1]),
                                  jnp.float32))["params"]
    opt_state = tx.init(params)
    step = make_bsn_pem_train_step(
        model, tx, weighted=True,
        u_ratio_m=mcfg.get("u_ratio_m", 1.0),
        u_ratio_l=mcfg.get("u_ratio_l", 2.0),
        high_thr=mcfg.get("high_iou_threshold", 0.6),
        low_thr=mcfg.get("low_iou_threshold", 0.2))
    rng = jax.random.key(1)
    history = []
    for epoch in range(epochs):
        order = np.random.default_rng(epoch).permutation(len(feats))
        losses = []
        for i in range(0, len(order), rows_per_step):
            sel = order[i:i + rows_per_step]
            if len(sel) < rows_per_step:   # static shapes: cycle rows
                sel = np.resize(sel, rows_per_step)
            rng, sub = jax.random.split(rng)
            params, opt_state, logs = step(
                params, opt_state, jnp.asarray(feats[sel]),
                jnp.asarray(gt_iou[sel]), sub)
            losses.append(float(logs["loss"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses))}
        history.append(rec)
        print(json.dumps(rec))

    # eval: fused score = pem * tmin_score * tmax_score, soft-NMS, AR@AN
    fn = jax.jit(lambda p, f: model.apply({"params": p}, f))
    post_k = mcfg.get("post_process_top_k", 100)
    gt, props, total = {}, {}, 0
    for v, r in _load_pgm_videos(cfg, "val", top_k):
        f = np.asarray(r["bsp_feature"], np.float32)
        n = len(f)
        pad = np.resize(np.arange(n), top_k)      # static eval shape
        pred = np.asarray(fn(params, jnp.asarray(f[pad])))[:n]
        score = pred * r["tmin_score"][:n] * r["tmax_score"][:n]
        rows = np.stack([r["tmin"][:n], r["tmax"][:n], score], 1)
        rows = soft_nms(rows, top_k=post_k)
        rows[:, :2] = rows[:, :2] * v["duration"]
        gt[v["video"]] = v["segments"] * v["duration"]
        props[v["video"]] = rows
        total += len(rows)
    recall, avg_recall, ppv, auc = average_recall_at_avg_proposals(
        gt, props, total_num_proposals=total, max_avg_proposals=post_k)
    report = {"auc": float(auc)}
    for n in (1, 5, 10, 100):
        report[f"AR@{n}"] = float(avg_recall[min(n, len(avg_recall)) - 1])
    save_checkpoint(os.path.join(work_dir, "pem_final"),
                    {"params": params}, None, report)
    print(json.dumps(report))
    return {"params": params}, history, report


def _resample_rows(feats: np.ndarray, T: int) -> np.ndarray:
    """Linear temporal resample of (t, F) snippet features to (T, F)
    (the ActivityNetDataset.features policy: one XLA program per
    corpus)."""
    if feats.shape[0] == T:
        return feats.astype(np.float32)
    pos = np.linspace(0, feats.shape[0] - 1, T)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, feats.shape[0] - 1)
    frac = (pos - lo)[:, None]
    return ((1 - frac) * feats[lo] + frac * feats[hi]).astype(np.float32)


def _train_ssn(cfg, mcfg, work_dir, bs, tx, epochs):
    """SSN over snippet features: the tag-style proposal file drives the
    positive/incomplete/background sampler; STPP pooling matrices are
    built host-side in snippet coordinates.  Reports the final val loss
    and positive-proposal activity accuracy (full THUMOS detection eval
    runs offline over `ssn_proposal_scores`)."""
    T = mcfg.get("temporal_dim", 100)
    scfg = SSNSamplerConfig(**dict(cfg.get("sampler", {}) or {}))
    sscfg = SSNConfig(feat_dim=mcfg.get("feat_dim", 400),
                      num_classes=mcfg.get("num_classes", 20),
                      parts=tuple(mcfg.get("parts", (1, 2, 1))),
                      hidden=mcfg.get("hidden", 256))
    head = SSNHead(sscfg)
    P = (scfg.positive_per_video + scfg.incomplete_per_video
         + scfg.background_per_video)
    lw = dict(cfg.get("ssn", {}) or {})
    step = make_ssn_batch_train_step(
        head, tx, scfg, comp_loss_weight=lw.get("comp_loss_weight", 0.1),
        reg_loss_weight=lw.get("reg_loss_weight", 0.1))

    def _batch(ds, prefix, idxs):
        feats, stpps, labels, ptypes, targets = [], [], [], [], []
        for i in idxs:
            item = ds[int(i)]
            f = _resample_rows(
                np.load(os.path.join(prefix,
                                     item["video_id"] + ".npy")), T)
            scale = T / max(item["total_frames"], 1)
            props = np.asarray(item["sampled_proposals"],
                               np.float64) * scale
            feats.append(f)
            stpps.append(stpp_matrix(T, props, sscfg.parts))
            labels.append(item["labels"])
            ptypes.append(item["proposal_type"])
            targets.append(item["bbox_targets"])
        return (jnp.asarray(np.stack(feats)), jnp.asarray(np.stack(stpps)),
                jnp.asarray(np.stack(labels)),
                jnp.asarray(np.stack(ptypes)),
                jnp.asarray(np.stack(targets)))

    train_ds = SSNDataset(cfg["data.train.ann_file"], sampler_cfg=scfg)
    train_prefix = cfg["data.train.feature_prefix"]
    params = head.init(jax.random.key(0), jnp.zeros((T, sscfg.feat_dim)),
                       jnp.zeros((P, sum(sscfg.parts) + 2, T)))["params"]
    opt_state = tx.init(params)
    history = []
    for epoch in range(epochs):
        order = np.random.default_rng(epoch).permutation(len(train_ds))
        losses = []
        for i in range(0, len(order), bs):
            sel = np.resize(order[i:i + bs], bs)   # static batch
            params, opt_state, logs = step(params, opt_state,
                                           *_batch(train_ds, train_prefix,
                                                   sel))
            losses.append(float(logs["loss"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses))}
        history.append(rec)
        print(json.dumps(rec))

    # val: sampled-layout loss + positive-proposal activity accuracy
    val_ds = SSNDataset(cfg["data.val.ann_file"], sampler_cfg=scfg,
                        seed=1)
    val_prefix = cfg["data.val.feature_prefix"]
    fn = jax.jit(lambda p, f, s: jax.vmap(
        lambda ff, ss: head.apply({"params": p}, ff, ss))(f, s))
    hits, n_pos = 0, 0
    for i in range(0, len(val_ds), bs):
        sel = np.resize(np.arange(i, min(i + bs, len(val_ds))), bs)
        n_real = min(bs, len(val_ds) - i)
        f, s, lab, pt, _tg = _batch(val_ds, val_prefix, sel)
        out = fn(params, f, s)
        act = np.asarray(out["activity"])[:n_real]
        lab_np = np.asarray(lab)[:n_real]
        pt_np = np.asarray(pt)[:n_real]
        pos = pt_np == 0
        hits += int((act.argmax(-1)[pos] == lab_np[pos]).sum())
        n_pos += int(pos.sum())
    report = {"pos_acc": hits / max(n_pos, 1),
              "final_loss": history[-1]["loss"]}
    save_checkpoint(os.path.join(work_dir, "ssn_final"),
                    {"params": params}, sscfg, report)
    print(json.dumps(report))
    return {"params": params}, history, report


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
