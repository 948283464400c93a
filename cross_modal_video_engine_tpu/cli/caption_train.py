"""Config-driven caption (label-sequence) training CLI — the
seq_generate family's tools/train.py (reference
MCT/configs/seq_generate/* + apis/train.py running
Recognizer3D_Relseq.forward_train with SeqMLL teacher forcing,
recognizer3d_relseq.py:75-91).

Config:

    model = dict(
        backbone=dict(num_frames=8, img_size=224, ...),   # TimeSformer
        decoder=dict(num_classes=36, in_channels=768, max_len=5))
    data = dict(
        train=dict(ann_file='train_relseq.txt', data_prefix='videos/'),
        val=dict(ann_file='val_relseq.txt', data_prefix='videos/'),
        pipeline=[...], videos_per_gpu=8)
    optimizer = dict(optimizer='sgd', learning_rate=0.005)
    total_epochs = 15

Validation scores the greedy thresholded-feedback inference with the
sequence-aware mAP (cli/caption_test.py scoring); save-best keys on it.
Checkpoints use the {backbone, decoder} config layout `init_recognizer`
(api.py) and the caption service/test CLIs load.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import ShardedSampler, VideoDatasetRelseq
from ..data.pipelines import build_pipeline
from ..metrics.accuracy import seq_average_precision
from ..models.decoder_head import RNNDecoderConfig
from ..models.recognizer import Recognizer3DRelseq
from ..models.timesformer import TimeSformerConfig
from ..train.checkpoint import best_checkpoint_manager
from ..train.recognition_trainer import (RecognitionTrainConfig,
                                         RecTrainState, make_rec_optimizer,
                                         make_seq_train_step)
from ..train.resume import load_train_state, save_train_state
from .caption_test import eval_labels


def _seq_batches(ds, batch_size, order=None):
    for imgs, items, n in ds.batches(batch_size, order):
        clips = jnp.asarray(imgs[:, 0].astype(np.float32))
        targets = jnp.asarray(np.stack([it["label"] for it in items]))
        mask = jnp.asarray(np.stack([it["mask"] for it in items]))
        yield clips, targets, mask, items, n


def evaluate_caption(model, variables, ds, batch_size) -> dict:
    fn = jax.jit(lambda v, x: model.apply(v, x, method="forward_test"))
    scores, labels = [], []
    for clips, _t, _m, items, n in _seq_batches(ds, batch_size):
        probs = np.asarray(fn(variables, clips))
        for i in range(n):
            scores.append(probs[i])
            labels.append(eval_labels(items[i]["label"], items[i]["mask"]))
    aps = seq_average_precision(scores, labels)
    return {"seq_mAP": float(np.mean(aps)), "num_videos": len(scores)}


def train_from_config(cfg: Config, work_dir: str,
                      resume: str | None = None,
                      num_epochs: int | None = None):
    bb_kw = {k: tuple(v) if isinstance(v, list) else v
             for k, v in cfg["model.backbone"].items()}
    btype = bb_kw.pop("type", "TimeSformer")
    dec_kw = dict(cfg["model.decoder"])
    if btype == "TimeSformer":
        model = Recognizer3DRelseq(TimeSformerConfig(**bb_kw),
                                   RNNDecoderConfig(**dec_kw))
        saved_bb = dict(bb_kw)
    else:
        # any pooled-feature backbone drives the decoder (seq_generate
        # covers i3d/mvit/slowfast/videomae/x3d too); per-frame
        # (B, T, C) backbones get a temporal mean adapter inside
        # build_caption_backbone
        from ..models.recognizer import RecognizerRelseq
        from .recognition_train import build_caption_backbone
        model = RecognizerRelseq(build_caption_backbone(btype, bb_kw),
                                 RNNDecoderConfig(**dec_kw))
        saved_bb = dict(bb_kw, type=btype)

    pipe = build_pipeline(cfg["data.pipeline"])
    num_classes = dec_kw["num_classes"]
    max_len = dec_kw.get("max_len", 5)
    train_ds = VideoDatasetRelseq(
        cfg["data.train.ann_file"], pipe, num_classes=num_classes,
        max_len=max_len, data_prefix=cfg.get("data.train.data_prefix"))
    val_ds = VideoDatasetRelseq(
        cfg["data.val.ann_file"], pipe, num_classes=num_classes,
        max_len=max_len, data_prefix=cfg.get("data.val.data_prefix"))
    bs = cfg.get("data.videos_per_gpu", 8)

    tcfg = RecognitionTrainConfig(**cfg.get("optimizer", {}))
    epochs = num_epochs or cfg.get("total_epochs", tcfg.num_epochs)
    # total_steps sizes the warmup-cosine schedule to the actual run
    tx = make_rec_optimizer(
        tcfg, total_steps=epochs * max(1, (len(train_ds) + bs - 1) // bs))
    clips0, t0, m0, _, _ = next(_seq_batches(train_ds, bs))
    variables = model.init(jax.random.key(0), clips0, t0,
                           mode="train")
    stats = variables.get("batch_stats")
    state = RecTrainState(variables["params"], tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    if stats is not None:
        from ..train.recognition_trainer import make_seq_train_step_stats
        step_bn = make_seq_train_step_stats(model, tx)
    else:
        step = make_seq_train_step(model, tx)
    save_best = best_checkpoint_manager(work_dir)
    sampler = ShardedSampler(len(train_ds), shuffle=True)
    rng = jax.random.key(1)

    start_epoch = 0
    if resume:
        # batch_stats ride in the payload so BN resumes warm.
        payload, loop = load_train_state(
            resume, {"state": state, "batch_stats": stats})
        state, stats = payload["state"], payload["batch_stats"]
        start_epoch = int(loop.get("epoch", -1)) + 1

    eval_interval = cfg.get("eval_interval", tcfg.eval_interval)
    history = []
    for epoch in range(start_epoch, epochs):
        losses = []
        for clips, targets, mask, _items, _n in _seq_batches(
                train_ds, bs, sampler.indices(epoch)):
            rng, sub = jax.random.split(rng)
            if stats is not None:
                state, stats, logs = step_bn(state, stats, clips, targets,
                                             mask, sub)
            else:
                state, logs = step(state, clips, targets, mask, sub)
            losses.append(float(logs["loss"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses))}
        live = {"params": state.params}
        if stats is not None:
            live["batch_stats"] = stats
        if (epoch + 1) % eval_interval == 0:
            report = evaluate_caption(model, live, val_ds, bs)
            rec.update(report)
            save_best(live, {"backbone": saved_bb, "decoder": dec_kw},
                      report["seq_mAP"], {"epoch": epoch})
        save_train_state(os.path.join(work_dir, f"epoch_{epoch}"),
                         {"state": state, "batch_stats": stats},
                         {"epoch": epoch})
        history.append(rec)
        print(json.dumps(rec))
    return history


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--work_dir", required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--total_epochs", type=int, default=None)
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    os.makedirs(args.work_dir, exist_ok=True)
    resume = None
    if args.resume:
        from ..train.resume import latest_checkpoint
        resume = latest_checkpoint(args.work_dir)
    return train_from_config(cfg, args.work_dir, resume=resume,
                             num_epochs=args.total_epochs)


if __name__ == "__main__":
    main()
