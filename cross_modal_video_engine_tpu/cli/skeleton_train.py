"""Config-driven skeleton-based action recognition training CLI.

The MCT tools/train.py path for the `configs/skeleton/` family
(MCT/configs/skeleton/{stgcn,2s-agcn,posec3d}/):

* STGCN / 2s-AGCN — graph backbones over (B, T, V, C) keypoints
  (models/stgcn.py).  2s-AGCN's second ("bone") stream is the same
  backbone fed bone vectors (joint - parent); `stream='bone'` converts
  on the host exactly like the reference's 2s pipeline, and
  `cli.skeleton_train` can late-fuse two streams at eval.
* PoseC3D — SlowOnly over GeneratePoseTarget pseudo-heatmap volumes
  (MCT/configs/skeleton/posec3d/slowonly_kinetics400_pretrained_r50_u48_
  120e_hmdb51_split1_keypoint.py: heatmaps (T, H, W, K) replace RGB).

Config shape:

    model = dict(backbone=dict(type='STGCN', num_joints=17),
                 num_classes=60)
    data = dict(train=dict(ann_file='train.pkl'),
                val=dict(ann_file='val.pkl'),
                clip_len=48, batch_size=16,
                stream='joint',                    # | 'bone'
                heatmap=dict(sigma=0.6, img_shape=(56, 56)))  # PoseC3D
    optimizer = dict(optimizer='sgd', learning_rate=0.1)
    total_epochs = 80

ann pickles are lists of {'keypoint': (M, T, V, C) or (T, V, C),
'label': int} — the poseC3D annotation format.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import ShardedSampler
from ..data.datasets_extra import PoseDataset
from ..models.recognizer import BackboneClassifier
from ..train.checkpoint import best_checkpoint_manager
from ..train.recognition_trainer import (
    RecognitionTrainConfig, RecTrainState, evaluate_classification,
    make_cls_train_step, make_rec_optimizer)
from ..train.recognition_trainer import make_cls_train_step_stats
from ..train.resume import (latest_checkpoint, load_train_state,
                            save_train_state)

# COCO-17 bone parents (2s-AGCN's bone stream: vec = joint - parent;
# reference tools/data/skeleton + agcn bone pairs)
COCO_PARENTS = (0, 0, 0, 1, 2, 0, 0, 5, 6, 7, 8, 0, 0, 11, 12, 13, 14)


def build_skeleton_model(cfg: Config):
    bcfg = dict(cfg["model.backbone"])
    btype = bcfg.pop("type", "STGCN")
    kw = {k: tuple(v) if isinstance(v, list) else v for k, v in bcfg.items()}
    num_classes = cfg["model.num_classes"]
    # heatmap (PoseC3D) inputs max-combine persons into one volume, so
    # per-person feature averaging only applies to the GCN streams
    person_avg = (cfg.get("data.num_persons", 1) > 1
                  and not cfg.get("data.heatmap"))

    def wrap(backbone):
        if person_avg:
            from ..models.stgcn import SkeletonClassifier
            return SkeletonClassifier(backbone, num_classes)
        return BackboneClassifier(backbone, num_classes)

    if btype == "STGCN":
        from ..models.stgcn import STGCN, STGCNConfig
        return wrap(STGCN(STGCNConfig(**kw)))
    if btype == "AGCN":
        from ..models.stgcn import AGCN, AGCNConfig
        return wrap(AGCN(AGCNConfig(**kw)))
    if btype in ("PoseC3D", "SlowOnly"):
        from ..models.resnet3d import ResNet3D, ResNet3DConfig
        return wrap(ResNet3D(ResNet3DConfig(**kw)))
    raise ValueError(f"unknown skeleton backbone {btype}")


def to_bone_stream(kp: np.ndarray,
                   parents=COCO_PARENTS) -> np.ndarray:
    """joint (T, V, C) -> bone vectors joint - parent (scores kept)."""
    parents = np.asarray(parents[: kp.shape[-2]])
    bones = kp.copy()
    bones[..., :2] = kp[..., :2] - kp[..., parents, :2]
    return bones


def _heatmap_volume(kp: np.ndarray, hm_cfg: Dict,
                    src_shape=None) -> np.ndarray:
    """PoseC3D input: GeneratePoseTarget pseudo-heatmaps (T, H, W, K).
    kp may be (T, V, C) or multi-person (M, T, V, C) — the heatmaps
    max-combine persons like the reference.

    src_shape: the (h, w) pixel frame of the keypoint coords (from the
    annotation's img_shape).  Keypoints rescale from it to the heatmap
    canvas — the reference pipeline's Resize-before-GeneratePoseTarget;
    without it raw 1080p coords land outside a 56x56 canvas and every
    gaussian clamps to empty.  None = coords already in heatmap space."""
    from ..data.pipelines_extra import GeneratePoseTarget
    h, w = hm_cfg.get("img_shape", (56, 56))
    op = GeneratePoseTarget(sigma=hm_cfg.get("sigma", 0.6),
                            use_score=hm_cfg.get("use_score", True),
                            with_kp=hm_cfg.get("with_kp", True),
                            with_limb=hm_cfg.get("with_limb", False))
    if kp.ndim == 3:
        kp = kp[None]
    xy = kp[..., :2]
    if src_shape is not None:
        sh, sw = src_shape
        xy = xy * np.asarray([w / sw, h / sh], np.float32)
    results = {"keypoint": xy,
               "keypoint_score": kp[..., 2]
               if kp.shape[-1] > 2 else np.ones(kp.shape[:-1],
                                                np.float32),
               "img_shape": (h, w)}
    return np.asarray(op(results)["imgs"], np.float32)


def skeleton_batches(ds: PoseDataset, batch_size: int,
                     stream: str = "joint",
                     heatmap: Optional[Dict] = None,
                     order=None) -> Iterator:
    order = list(order if order is not None else range(len(ds)))
    for i in range(0, len(order), batch_size):
        sel = order[i:i + batch_size]
        n = len(sel)
        while len(sel) < batch_size:
            sel.append(sel[0])
        xs, ys = [], []
        for j in sel:
            kp, label = ds[j]
            if stream == "bone":
                kp = to_bone_stream(kp)
            x = (_heatmap_volume(kp, heatmap, ds.src_shape(j))
                 if heatmap else kp)
            xs.append(x)
            ys.append(label)
        yield (jnp.asarray(np.stack(xs)),
               jnp.asarray(np.asarray(ys, np.int64)), n)


def train_from_config(cfg: Config, work_dir: str,
                      resume: Optional[str] = None,
                      num_epochs: Optional[int] = None):
    model = build_skeleton_model(cfg)
    clip_len = cfg.get("data.clip_len", 48)
    num_joints = cfg.get("model.backbone.num_joints", 17)
    stream = cfg.get("data.stream", "joint")
    heatmap = cfg.get("data.heatmap")
    bs = cfg.get("data.batch_size", 16)
    num_persons = cfg.get("data.num_persons", 1)

    train_ds = PoseDataset(cfg["data.train.ann_file"], clip_len,
                           num_joints, num_persons)
    val_ds = PoseDataset(cfg["data.val.ann_file"], clip_len, num_joints,
                         num_persons)

    tcfg = RecognitionTrainConfig(**cfg.get("optimizer", {}))
    epochs = num_epochs or cfg.get("total_epochs", tcfg.num_epochs)
    # total_steps sizes the warmup-cosine schedule to the actual run
    # (the 10k default would decay lr to 0 mid-run on real datasets)
    tx = make_rec_optimizer(
        tcfg, total_steps=epochs * max(1, (len(train_ds) + bs - 1) // bs))
    x0, _, _ = next(skeleton_batches(train_ds, bs, stream, heatmap))
    variables = model.init(jax.random.key(0), x0)
    stats = variables.get("batch_stats")
    state = RecTrainState(variables["params"], tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))
    if stats is not None:
        step_bn = make_cls_train_step_stats(model, tx,
                                            bf16=tcfg.bf16)
    else:
        step = make_cls_train_step(model, tx, bf16=tcfg.bf16)
    save_best = best_checkpoint_manager(work_dir)
    sampler = ShardedSampler(len(train_ds), shuffle=True)
    rng = jax.random.key(1)

    start_epoch = 0
    if resume:
        payload, loop = load_train_state(
            resume, {"state": state, "batch_stats": stats})
        state, stats = payload["state"], payload["batch_stats"]
        start_epoch = int(loop.get("epoch", -1)) + 1

    eval_interval = cfg.get("eval_interval", tcfg.eval_interval)
    history: List[Dict] = []
    for epoch in range(start_epoch, epochs):
        losses, accs = [], []
        for x, labels, _n in skeleton_batches(train_ds, bs, stream,
                                              heatmap,
                                              sampler.indices(epoch)):
            rng, sub = jax.random.split(rng)
            if stats is not None:
                state, stats, logs = step_bn(state, stats, x, labels, sub)
            else:
                state, logs = step(state, x, labels, sub)
            losses.append(float(logs["loss"]))
            accs.append(float(logs["top1_acc"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "train_top1": float(np.mean(accs))}
        if (epoch + 1) % eval_interval == 0:
            report = evaluate_classification(
                model, state.params,
                skeleton_batches(val_ds, bs, stream, heatmap),
                stats=stats)
            rec.update(report)
            live = {"params": state.params}
            if stats is not None:
                live["batch_stats"] = stats
            save_best(live, {"backbone": cfg["model.backbone"],
                             "num_classes": cfg["model.num_classes"],
                             "stream": stream},
                      report["top1_acc"], {"epoch": epoch})
        save_train_state(os.path.join(work_dir, f"epoch_{epoch}"),
                         {"state": state, "batch_stats": stats},
                         {"epoch": epoch})
        history.append(rec)
        print(json.dumps(rec))
    return state, history


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("--work_dir", default="work_dirs/skeleton")
    parser.add_argument("--resume", nargs="?", const="latest", default=None)
    parser.add_argument("--total_epochs", type=int, default=None)
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    os.makedirs(args.work_dir, exist_ok=True)
    resume = args.resume
    if resume == "latest":
        resume = latest_checkpoint(args.work_dir)
    _, history = train_from_config(cfg, args.work_dir, resume,
                                   args.total_epochs)
    return history


if __name__ == "__main__":
    main()
