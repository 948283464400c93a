"""Config-driven AVA spatio-temporal detection training CLI.

The MCT tools/train.py path for the `configs/detection/ava/` family
(FastRCNN = ResNet3dSlowOnly backbone + AVARoIHead; see
MCT/configs/detection/ava/slowonly_kinetics_pretrained_r50_4x16x1_20e_ava_rgb.py).
Config shape:

    model = dict(
        backbone=dict(type='SlowOnly', stage_blocks=(1, 1, 1, 1),
                      stage_spatial_strides=(1, 2, 2, 1)),
        roi_head=dict(num_classes=81, roi_size=8, dropout=0.5),
        test_cfg=dict(action_thr=0.002),
        train_cfg=dict(pos_iou_thr=0.9, max_boxes=8))
    data = dict(
        train=dict(ann_file='ava_train.csv', data_prefix='videos/',
                   proposal_file=None),
        val=dict(ann_file='ava_val.csv', data_prefix='videos/'),
        fps=30, timestamp_start=0,
        pipeline=[dict(type='DecordInit'),
                  dict(type='SampleAVAFrames', clip_len=4,
                       frame_interval=2),
                  dict(type='DecordDecode'),
                  dict(type='Resize', scale=(32, 32), keep_ratio=False),
                  dict(type='Normalize', mean=[127.5]*3, std=[127.5]*3),
                  dict(type='FormatShape', input_format='NTHWC')],
        videos_per_gpu=4)
    optimizer = dict(optimizer='sgd', learning_rate=0.01)
    total_epochs = 20

Proposal files (``proposal_file``) are json: {"video,ts(4-digit)":
[[x1, y1, x2, y2], ...]} with normalized coords — the FAIR dense-
proposal pickle's content, in a dependency-light format.  Without one,
training runs on GT person boxes (add_gt_as_proposals semantics).
``data.val.proposal_file`` supplies the eval candidates (the
reference's proposal_file_val); without it eval scores GT boxes, which
measures action classification only.  ``data.val.pipeline`` overrides
the eval pipeline; by default the train pipeline is reused with
SampleAVAFrames flipped to test_mode (deterministic center sampling).

FBO configs take ``model.lfb = dict(window_size, capacity, path,
checkpoint)``: ``checkpoint`` points at a trained base-detector
checkpoint whose backbone features fill the bank (the reference's
staged train-base -> infer-LFB -> train-FBO workflow); ``path`` caches
the built bank on disk.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

from ..config import Config
from ..data.datasets import ShardedSampler
from ..data.datasets_extra import AVADataset
from ..data.pipelines import build_pipeline
from ..models.ava_head import AVAHeadConfig
from ..train.detection_trainer import (
    AVAFastRCNN, DetTrainState, assign_proposals, evaluate_ava_detection,
    make_det_infer, make_det_train_step, pack_detection_batch)
from ..train.recognition_trainer import (RecognitionTrainConfig,
                                         make_rec_optimizer)
from ..train.checkpoint import best_checkpoint_manager
from ..train.resume import (latest_checkpoint, load_train_state,
                            save_train_state)
from ..metrics.ava import make_image_key
from .recognition_train import _deep_tuple, build_backbone


def build_detection_model(cfg: Config) -> AVAFastRCNN:
    bcfg = dict(cfg["model.backbone"])
    btype = bcfg.pop("type", "SlowOnly")
    kw = {k: _deep_tuple(v) for k, v in bcfg.items()}
    head = AVAHeadConfig(**cfg.get("model.roi_head", {}))
    shared = None
    scfg = cfg.get("model.shared_head")
    if scfg:
        scfg = dict(scfg)
        stype = scfg.pop("type")
        if stype == "ACRN":
            from ..models.lfb import ACRNHead, ACRNHeadConfig
            shared = ACRNHead(ACRNHeadConfig(**scfg))
        elif stype == "FBO":
            from ..models.lfb import FBOHead, FBOHeadConfig
            shared = FBOHead(FBOHeadConfig(**scfg))
        else:
            raise ValueError(f"unknown shared head {stype}")
    return AVAFastRCNN(build_backbone(btype, kw), head, shared)


def _load_proposals(path: Optional[str]) -> Optional[Dict[str, np.ndarray]]:
    if not path:
        return None
    with open(path) as f:
        raw = json.load(f)
    return {k: np.asarray(v, np.float32).reshape(-1, 4)
            for k, v in raw.items()}


def _decode_clip(pipeline, item: Dict, fps: float, ts_start: float,
                 proposals: Optional[np.ndarray] = None):
    """Run the decode pipeline for one keyframe.  GT boxes and
    proposals ride through the pipeline under the mmaction keys
    (gt_bboxes / proposals) so geometric ops like Flip mirror them in
    sync with the frames."""
    results = dict(item)
    results.setdefault("fps", fps)
    results.setdefault("timestamp_start", ts_start)
    results.setdefault("start_index", 0)
    results["gt_bboxes"] = np.asarray(item["boxes"], np.float32)
    results["bbox_coords"] = "normalized"    # AVA [0,1] convention
    if proposals is not None:
        results["proposals"] = np.asarray(proposals, np.float32)
    out = pipeline(results)
    clip = np.asarray(out["imgs"], np.float32)
    if clip.ndim == 5:          # (num_clips, T, H, W, C) -> clip 0
        clip = clip[0]
    return (clip, np.asarray(out["gt_bboxes"], np.float32),
            out.get("proposals"))


def det_batches(ds: AVADataset, pipeline, batch_size: int,
                num_classes: int, max_boxes: int, fps: float,
                ts_start: float, proposals=None, pos_iou_thr: float = 0.9,
                order=None, include_meta: bool = False
                ) -> Iterator[Dict]:
    """Decode + assign + pack keyframe batches (static shapes; tail
    batches repeat row 0 with valid=0 via pack's n bookkeeping)."""
    order = list(order if order is not None else range(len(ds)))
    for i in range(0, len(order), batch_size):
        sel = order[i:i + batch_size]
        n = len(sel)
        while len(sel) < batch_size:
            sel.append(sel[0])
        items = []
        metas = []
        for j in sel:
            kf = ds[j]
            props = None
            if proposals is not None:
                props = proposals.get(
                    make_image_key(kf["video_id"], kf["timestamp"]),
                    np.zeros((0, 4), np.float32))
            clip, gt_boxes, props = _decode_clip(pipeline, kf, fps,
                                                 ts_start, props)
            boxes, labels = assign_proposals(
                props if props is not None else np.zeros((0, 4), np.float32),
                gt_boxes, kf["labels"], num_classes, pos_iou_thr)
            items.append(dict(clip=clip, boxes=boxes, labels=labels))
            metas.append(dict(kf, boxes=gt_boxes))
        clips, rois, labels, valid = pack_detection_batch(
            items, max_boxes, num_classes)
        valid[n * max_boxes:] = 0.0
        batch = dict(clips=clips, rois=rois, labels=labels, valid=valid,
                     n=n)
        if include_meta:
            batch["video_id"] = [m["video_id"] for m in metas[:n]]
            batch["timestamp"] = [m["timestamp"] for m in metas[:n]]
            batch["gt_boxes"] = [m["boxes"] for m in metas[:n]]
            batch["gt_labels"] = [m["labels"] for m in metas[:n]]
        yield batch


def train_from_config(cfg: Config, work_dir: str,
                      resume: Optional[str] = None,
                      num_epochs: Optional[int] = None):
    model = build_detection_model(cfg)
    num_classes = cfg.get("model.roi_head.num_classes", 81)
    max_boxes = cfg.get("model.train_cfg.max_boxes", 8)
    pos_iou_thr = cfg.get("model.train_cfg.pos_iou_thr", 0.9)
    action_thr = cfg.get("model.test_cfg.action_thr", 0.002)
    fps = cfg.get("data.fps", 30)
    ts_start = cfg.get("data.timestamp_start", 0)
    bs = cfg.get("data.videos_per_gpu", 4)

    pipe = build_pipeline(cfg["data.pipeline"])
    # val pipeline: data.val.pipeline if given, else the train pipeline
    # with SampleAVAFrames flipped to test_mode (deterministic center
    # sampling — the reference's val_pipeline; without this every eval
    # epoch would score with random per-frame jitter)
    val_pipe_cfg = cfg.get("data.val.pipeline")
    if val_pipe_cfg is None:
        val_pipe_cfg = [dict(op, test_mode=True)
                        if op.get("type") == "SampleAVAFrames" else op
                        for op in cfg["data.pipeline"]]
    val_pipe = build_pipeline(val_pipe_cfg)
    train_ds = AVADataset(cfg["data.train.ann_file"], num_classes,
                          cfg.get("data.train.data_prefix"))
    val_ds = AVADataset(cfg["data.val.ann_file"], num_classes,
                        cfg.get("data.val.data_prefix"))
    proposals = _load_proposals(cfg.get("data.train.proposal_file"))
    # val proposals (the reference's proposal_file_val): without them
    # eval candidates are the GT person boxes themselves, which makes
    # localization perfect by construction
    val_proposals = _load_proposals(cfg.get("data.val.proposal_file"))

    tcfg = RecognitionTrainConfig(**cfg.get("optimizer", {}))
    epochs = num_epochs or cfg.get("total_epochs", tcfg.num_epochs)
    steps_per_epoch = max(1, (len(train_ds) + bs - 1) // bs)
    tx = make_rec_optimizer(tcfg, total_steps=epochs * steps_per_epoch)

    # long-term feature bank (FBO configs): load from model.lfb.path or
    # build it from the train split with the freshly initialized
    # backbone (the reference's separate lfb-infer run, inlined)
    bank = None
    window_size = cfg.get("model.lfb.window_size", 60)
    from ..models.lfb import FBOHead
    uses_fbo = isinstance(model.shared_head, FBOHead)
    if uses_fbo:
        from ..models.lfb import LongTermFeatureBank
        from ..train.detection_trainer import build_lfb, sample_lt_features
        lfb_path = cfg.get("model.lfb.path")
        if lfb_path and os.path.exists(lfb_path):
            bank = LongTermFeatureBank.load(lfb_path)

    first = next(det_batches(train_ds, pipe, bs, num_classes, max_boxes,
                             fps, ts_start, proposals, pos_iou_thr,
                             include_meta=True))
    if uses_fbo and bank is None:
        # Bootstrap the bank over BOTH splits (the reference runs its
        # lfb-infer stage once per split; a train-only bank would leave
        # every val keyframe with an all-zero long-term window).  With
        # model.lfb.checkpoint the features come from a trained base
        # detector (the reference's staged workflow: train base ->
        # infer LFB -> train FBO); without it the freshly-initialized
        # backbone is used — fine for smoke runs, documentedly weaker
        # features for real training.
        import itertools

        bare = AVAFastRCNN(model.backbone, model.head_cfg)
        bvars = bare.init(jax.random.key(0), first["clips"], first["rois"])
        bparams, bstats = bvars["params"], bvars["batch_stats"]
        lfb_ckpt = cfg.get("model.lfb.checkpoint")
        if lfb_ckpt:
            from ..train.checkpoint import load_checkpoint
            restored, _, _ = load_checkpoint(
                lfb_ckpt, {"params": bparams, "batch_stats": bstats})
            bparams, bstats = restored["params"], restored["batch_stats"]
        bank = build_lfb(
            bare, bparams, bstats,
            itertools.chain(
                det_batches(train_ds, pipe, bs, num_classes, max_boxes,
                            fps, ts_start, include_meta=True),
                det_batches(val_ds, val_pipe, bs, num_classes, max_boxes,
                            fps, ts_start, val_proposals,
                            include_meta=True)),
            capacity=cfg.get("model.lfb.capacity", 5))
        lfb_path = cfg.get("model.lfb.path")
        if lfb_path:
            bank.save(lfb_path)

    lt0 = None
    if uses_fbo:
        lt0 = sample_lt_features(bank, first["video_id"],
                                 first["timestamp"], max_boxes,
                                 window_size, first["clips"].shape[0])
    variables = model.init(jax.random.key(0), first["clips"], first["rois"],
                           lt_feat=lt0)
    stats = variables["batch_stats"]
    state = DetTrainState(variables["params"],
                          tx.init(variables["params"]),
                          np.int32(0))
    step = make_det_train_step(model, tx)
    infer = make_det_infer(model)
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
        for batch in det_batches(train_ds, pipe, bs, num_classes,
                                 max_boxes, fps, ts_start, proposals,
                                 pos_iou_thr, sampler.indices(epoch),
                                 include_meta=uses_fbo):
            rng, sub = jax.random.split(rng)
            lt = None
            if uses_fbo:
                lt = sample_lt_features(bank, batch["video_id"],
                                        batch["timestamp"], max_boxes,
                                        window_size,
                                        batch["clips"].shape[0])
            state, stats, logs = step(state, stats, batch["clips"],
                                      batch["rois"], batch["labels"],
                                      batch["valid"], sub, lt)
            losses.append(float(logs["loss"]))
            accs.append(float(logs["label_acc"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "label_acc": float(np.mean(accs))}
        if (epoch + 1) % eval_interval == 0:
            report = evaluate_ava_detection(
                infer, state.params, stats,
                det_batches(val_ds, val_pipe, bs, num_classes, max_boxes,
                            fps, ts_start, val_proposals,
                            include_meta=True),
                num_classes, action_thr,
                bank=bank if uses_fbo else None,
                window_size=window_size)
            rec["mAP@0.5IOU"] = report["mAP@0.5IOU"]
            save_best({"params": state.params, "batch_stats": stats},
                      {"backbone": cfg["model.backbone"],
                       "roi_head": cfg.get("model.roi_head", {})},
                      report["mAP@0.5IOU"], {"epoch": epoch})
        save_train_state(os.path.join(work_dir, f"epoch_{epoch}"),
                         {"state": state, "batch_stats": stats},
                         {"epoch": epoch})
        history.append(rec)
        print(json.dumps(rec))
    return state, history


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("--work_dir", default="work_dirs/detection")
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
