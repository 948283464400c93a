"""Config-driven audio recognition training CLI (the recognition_audio
family: mmaction configs/recognition_audio/* training AudioRecognizer
over log-mel features via tools/train.py).

Config:

    model = dict(num_classes=10, channels=[32, 64, 128], n_mels=80)
    data = dict(
        train=dict(ann_file='audio_train.txt', data_prefix='feats/'),
        val=dict(ann_file='audio_val.txt', data_prefix='feats/'),
        pipeline=[
            dict(type='LoadAudioFeature'),
            dict(type='SampleFrames', clip_len=32, frame_interval=2,
                 num_clips=1, test_mode=True),
            dict(type='AudioFeatureSelector', fixed_length=128),
        ],
        videos_per_gpu=16)
    optimizer = dict(optimizer='sgd', learning_rate=0.01)
    total_epochs = 40

Annotations follow AudioFeatureDataset (`path total_frames label`);
features come from `data_tools build_audio_features` / extract_audio.
The AudioRecognizer has BatchNorm, so training uses the stats-threaded
step and checkpoints carry batch_stats.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import AudioFeatureDataset, ShardedSampler
from ..data.pipelines import build_pipeline
from ..models.audio import AudioConfig, AudioRecognizer
from ..train.checkpoint import best_checkpoint_manager
from ..train.recognition_trainer import (RecognitionTrainConfig,
                                         RecTrainState,
                                         evaluate_classification,
                                         make_cls_train_step_stats,
                                         make_rec_optimizer)
from ..train.resume import load_train_state, save_train_state


def _audio_batches(ds, batch_size, order=None):
    order = list(order if order is not None else range(len(ds)))
    for i in range(0, len(order), batch_size):
        sel = order[i:i + batch_size]
        n = len(sel)
        while len(sel) < batch_size:
            sel.append(sel[0])
        items = [ds[j] for j in sel]
        # (clips, T, F) -> first clip, time-major spectrogram
        spec = jnp.asarray(np.stack(
            [np.asarray(it["audios"][0], np.float32) for it in items]))
        labels = jnp.asarray([it["label"] for it in items], jnp.int32)
        yield spec, labels, n


def train_from_config(cfg: Config, work_dir: str,
                      resume: str | None = None,
                      num_epochs: int | None = None):
    mcfg = dict(cfg["model"])
    mcfg.pop("type", None)
    if "channels" in mcfg:
        mcfg["channels"] = tuple(mcfg["channels"])
    acfg = AudioConfig(**mcfg)
    model = AudioRecognizer(acfg)

    pipe = build_pipeline(cfg["data.pipeline"])
    train_ds = AudioFeatureDataset(
        cfg["data.train.ann_file"], pipe,
        data_prefix=cfg.get("data.train.data_prefix"))
    val_ds = AudioFeatureDataset(
        cfg["data.val.ann_file"], pipe,
        data_prefix=cfg.get("data.val.data_prefix"))
    bs = cfg.get("data.videos_per_gpu", 16)

    tcfg = RecognitionTrainConfig(**cfg.get("optimizer", {}))
    epochs = num_epochs or cfg.get("total_epochs", tcfg.num_epochs)
    # total_steps sizes the warmup-cosine schedule to the actual run
    tx = make_rec_optimizer(
        tcfg, total_steps=epochs * max(1, (len(train_ds) + bs - 1) // bs))
    spec0, _l0, _ = next(_audio_batches(train_ds, bs))
    variables = model.init(jax.random.key(0), spec0)
    stats = variables["batch_stats"]
    state = RecTrainState(variables["params"], tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    step = make_cls_train_step_stats(model, tx, bf16=tcfg.bf16)
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
        losses, accs = [], []
        for spec, labels, _n in _audio_batches(train_ds, bs,
                                               sampler.indices(epoch)):
            rng, sub = jax.random.split(rng)
            state, stats, logs = step(state, stats, spec, labels, sub)
            losses.append(float(logs["loss"]))
            accs.append(float(logs["top1_acc"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "train_top1": float(np.mean(accs))}
        if (epoch + 1) % eval_interval == 0:
            report = evaluate_classification(
                model, state.params, _audio_batches(val_ds, bs),
                stats=stats)
            rec.update(report)
            save_best({"params": state.params, "batch_stats": stats},
                      dict(cfg["model"]), report["top1_acc"],
                      {"epoch": epoch})
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
