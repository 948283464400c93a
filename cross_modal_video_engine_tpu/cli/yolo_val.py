"""Standalone YOLOv5 detector validation CLI.

The MCT/yolov5/val.py offline-eval surface: load a trained (or
imported) detector checkpoint, run letterbox inference + NMS over a
yolov5-format validation directory, and print the COCO-protocol
summary row (mAP@0.5, mAP@0.5:0.95, precision, recall, per-class AP)
as one JSON line.

    python -m cross_modal_video_engine_tpu.cli.yolo_val CONFIG \\
        --checkpoint work/yolo/best [--conf 0.001 --iou 0.6]

`--checkpoint` accepts either a trainer `best/` dir (EMA weights from
cli/yolo_train.py) or a `cli/convert_checkpoint --type yolov5` output.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from ..config import Config
from .yolo_train import (YoloDetectionDataset, YoloSegDataset,
                         build_yolo_model, evaluate_detector,
                         evaluate_segmenter, yolo_batches,
                         yolo_seg_batches)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--conf", type=float, default=0.001)
    parser.add_argument("--iou", type=float, default=0.6)
    parser.add_argument("--augment", action="store_true",
                        help="scale/flip test-time augmentation "
                             "(val.py --augment; detection models only)")
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)

    model = build_yolo_model(cfg)
    # evolved AutoAnchor geometry rides in the checkpoint meta
    loop_path = os.path.join(args.checkpoint, "loop_state.json")
    if os.path.exists(loop_path):
        meta = json.load(open(loop_path))
        if meta.get("anchors"):
            import dataclasses
            from ..models.yolo import YoloV5
            anchors = tuple(tuple(tuple(a) for a in layer)
                            for layer in meta["anchors"])
            model = YoloV5(dataclasses.replace(model.cfg, anchors=anchors))

    img_size = model.cfg.img_size
    variables = model.init(
        jax.random.key(0),
        np.zeros((1, img_size, img_size, 3), np.float32), train=False)
    if os.path.exists(os.path.join(args.checkpoint, "train_state.msgpack")):
        from ..train.resume import load_train_state
        payload, _ = load_train_state(
            args.checkpoint, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]})
    else:  # convert_checkpoint output
        from ..train.checkpoint import load_checkpoint
        payload, _, _ = load_checkpoint(
            args.checkpoint, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]})

    bs = cfg.get("data.batch_size", 16)
    max_t = cfg.get("data.max_targets", 64)
    if model.cfg.masks > 0:   # segment/val.py route: box + mask mAP
        if args.augment:
            raise SystemExit("--augment supports detection models only "
                             "(the reference Segment head has no TTA "
                             "mask merge either)")
        mask_ratio = cfg.get("data.mask_ratio", 4)
        seg_ds = YoloSegDataset(cfg["data.val.img_dir"],
                                cfg["data.val.label_dir"])
        report = evaluate_segmenter(
            model, payload["params"], payload["batch_stats"],
            yolo_seg_batches(seg_ds, bs, img_size, max_t, mask_ratio),
            conf_thres=args.conf, iou_thres=args.iou,
            mask_ratio=mask_ratio)
    else:
        ds = YoloDetectionDataset(cfg["data.val.img_dir"],
                                  cfg["data.val.label_dir"])
        report = evaluate_detector(
            model, payload["params"], payload["batch_stats"],
            yolo_batches(ds, bs, img_size, max_t),
            conf_thres=args.conf, iou_thres=args.iou,
            augment=args.augment)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
