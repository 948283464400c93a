"""Offline AVA detection evaluation CLI (MCT tools/test.py for the
detection family).

Loads a trained detection checkpoint (best_checkpoint_manager layout),
runs inference over the val keyframes, writes the AVA-format results
csv via metrics.ava.results2csv, and — when a label map is given —
scores frame-mAP through the file-level `ava_eval` path exactly like
the reference's `results2csv` + `ava_eval` flow
(MCT/mmaction/core/evaluation/ava_utils.py:36-240; dataset.evaluate in
mmaction/datasets/ava_dataset.py).

    python -m cross_modal_video_engine_tpu.cli.detection_test CONFIG \
        --checkpoint work_dirs/detection/model_best \
        --out results.csv [--label_file ava_labels.pbtxt] \
        [--exclude_file excluded.csv]
"""

from __future__ import annotations

import argparse
import json
from typing import List

import numpy as np

from ..config import Config
from ..data.datasets_extra import AVADataset
from ..data.pipelines import build_pipeline
from ..metrics.ava import ava_eval, results2csv
from ..train.checkpoint import load_checkpoint
from ..train.detection_trainer import detection_results, make_det_infer
from .detection_train import build_detection_model, det_batches


def run_detection_test(cfg: Config, checkpoint: str, out_csv: str,
                       label_file: str | None = None,
                       exclude_file: str | None = None):
    model = build_detection_model(cfg)
    num_classes = cfg.get("model.roi_head.num_classes", 81)
    max_boxes = cfg.get("model.train_cfg.max_boxes", 8)
    action_thr = cfg.get("model.test_cfg.action_thr", 0.002)
    fps = cfg.get("data.fps", 30)
    ts_start = cfg.get("data.timestamp_start", 0)
    bs = cfg.get("data.videos_per_gpu", 4)

    variables, _cfg_d, _meta = load_checkpoint(checkpoint)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    infer = make_det_infer(model)

    # the VAL pipeline, like the trainer's eval: SampleAVAFrames flips
    # to test_mode (deterministic center sampling — the train pipeline
    # would score with random per-frame jitter), data.val.pipeline
    # overrides
    val_pipe_cfg = cfg.get("data.val.pipeline")
    if val_pipe_cfg is None:
        val_pipe_cfg = [dict(op, test_mode=True)
                        if op.get("type") == "SampleAVAFrames" else op
                        for op in cfg["data.pipeline"]]
    pipe = build_pipeline(val_pipe_cfg)
    val_ds = AVADataset(cfg["data.val.ann_file"], num_classes,
                        cfg.get("data.val.data_prefix"))
    # val proposals (reference proposal_file_val) — without them the
    # candidates are the GT person boxes and localization is perfect by
    # construction
    from .detection_train import _load_proposals
    val_proposals = _load_proposals(cfg.get("data.val.proposal_file"))

    # FBO/LFB checkpoints need the long-term feature bank
    from ..models.lfb import FBOHead
    bank = None
    window_size = cfg.get("model.lfb.window_size", 60)
    if isinstance(model.shared_head, FBOHead):
        import os

        from ..models.lfb import LongTermFeatureBank
        lfb_path = cfg.get("model.lfb.path")
        if not (lfb_path and os.path.exists(lfb_path)):
            raise ValueError(
                "FBO checkpoint needs the feature bank: set "
                "model.lfb.path to the bank the trainer saved")
        bank = LongTermFeatureBank.load(lfb_path)

    # per-keyframe, per-class result lists in dataset order
    results: List[List[np.ndarray]] = [None] * len(val_ds)
    order_pos = 0
    for batch in det_batches(val_ds, pipe, bs, num_classes, max_boxes,
                             fps, ts_start, val_proposals,
                             include_meta=True):
        lt = None
        if bank is not None:
            from ..train.detection_trainer import sample_lt_features
            lt = sample_lt_features(bank, batch["video_id"],
                                    batch["timestamp"], max_boxes,
                                    window_size, batch["clips"].shape[0])
        scores = np.asarray(infer(params, stats, batch["clips"],
                                  batch["rois"], lt))
        for b in range(batch["n"]):
            sl = slice(b * max_boxes, (b + 1) * max_boxes)
            n = int(batch["valid"][sl].sum())
            results[order_pos] = detection_results(
                scores[sl], batch["rois"][sl][:, 1:], n, num_classes,
                action_thr)
            order_pos += 1

    results2csv(val_ds, results, out_csv)
    report = {"out": out_csv, "n_keyframes": len(val_ds)}
    if label_file:
        metrics = ava_eval(out_csv, "mAP", label_file,
                           cfg["data.val.ann_file"], exclude_file,
                           verbose=False)
        report.update(metrics)
    print(json.dumps(report))
    return report


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", default="results.csv")
    parser.add_argument("--label_file", default=None)
    parser.add_argument("--exclude_file", default=None)
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    return run_detection_test(cfg, args.checkpoint, args.out,
                              args.label_file, args.exclude_file)


if __name__ == "__main__":
    main()
