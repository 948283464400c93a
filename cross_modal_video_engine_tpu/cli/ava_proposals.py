"""Generate AVA person proposals with the in-tree YOLOv5 detector.

The reference trains detection on precomputed FAIR dense proposals
(`ava_dense_proposals_*.FAIR.recall_93.9.pkl`,
MCT/configs/detection/ava/*.py) whose generator is not vendored.  This
tool closes the loop with the framework's own detector: for every
keyframe in an AVA annotation csv it decodes the center frame, runs the
(imported, mask-fidelity-tested) YOLOv5, keeps `person_class` boxes
above `conf`, and writes the normalized-coordinate proposal json that
`cli/detection_train` consumes via ``data.train.proposal_file``:

    {"<video_id>,<tttt>": [[x1, y1, x2, y2], ...], ...}

    python -m cross_modal_video_engine_tpu.cli.ava_proposals \
        --ann_file ava_train.csv --data_prefix videos/ \
        --yolo_checkpoint yolo_ckpt --out proposals.json
"""

from __future__ import annotations

import argparse
import json
from typing import Callable, Dict, List, Optional

import numpy as np

from ..data.datasets_extra import AVADataset
from ..io.video_decode import open_video
from ..metrics.ava import make_image_key


def keyframe_frame(path: str, timestamp: float, fps: float,
                   timestamp_start: float = 0.0) -> Optional[np.ndarray]:
    """Decode the keyframe-center frame (SampleAVAFrames center math)."""
    reader = open_video(path)
    n = len(reader)
    if n == 0:
        reader.release()
        return None
    # +1 matches SampleAVAFrames' center (pipelines_extra.py: center =
    # fps*(ts - ts0) + 1) so boxes pair with the exact clip-center frame
    idx = int(np.clip(round(fps * (timestamp - timestamp_start)) + 1,
                      0, n - 1))
    frame = reader.get_batch([idx])[0]
    reader.release()
    return frame


def person_proposals_for_frame(detector_fn: Callable, frame: np.ndarray,
                               person_class: int = 0,
                               conf: float = 0.25,
                               max_boxes: int = 32) -> np.ndarray:
    """detector_fn: (1, H, W, 3) u8 -> [(n, 6) x1,y1,x2,y2,conf,cls in
    pixel coords].  Returns (m, 4) normalized x1y1x2y2 person boxes."""
    H, W = frame.shape[:2]
    det = np.asarray(detector_fn(frame[None])[0])
    if det.size == 0:
        return np.zeros((0, 4), np.float32)
    keep = (det[:, 5].astype(int) == person_class) & (det[:, 4] >= conf)
    det = det[keep]
    order = np.argsort(-det[:, 4])[:max_boxes]
    boxes = det[order, :4] / np.asarray([W, H, W, H], np.float32)
    return np.clip(boxes, 0.0, 1.0).astype(np.float32)


def build_proposals(ds: AVADataset, detector_fn: Callable, fps: float,
                    timestamp_start: float = 0.0, person_class: int = 0,
                    conf: float = 0.25,
                    max_boxes: int = 32) -> Dict[str, List]:
    out: Dict[str, List] = {}
    for i in range(len(ds)):
        kf = ds[i]
        frame = keyframe_frame(kf["filename"], kf["timestamp"], fps,
                               timestamp_start)
        key = make_image_key(kf["video_id"], kf["timestamp"])
        if frame is None:
            out[key] = []
            continue
        boxes = person_proposals_for_frame(detector_fn, frame,
                                           person_class, conf, max_boxes)
        out[key] = [[float(v) for v in b] for b in boxes]
    return out


def make_yolo_detector(checkpoint: str, img_size: int = 640,
                       conf: float = 0.25, iou: float = 0.45):
    """Jitted YOLOv5 detector from a converted checkpoint: u8 frames ->
    per-frame (n, 6) rows in the ORIGINAL frame's pixel coords."""
    import cv2
    import jax
    import jax.numpy as jnp
    from ..models.yolo import YoloConfig, YoloV5, decode_predictions, \
        postprocess
    from ..train.checkpoint import load_checkpoint

    variables, cfg_d, _ = load_checkpoint(checkpoint)
    kw = {k: tuple(tuple(a) for a in v) if k == "anchors"
          else (tuple(v) if isinstance(v, list) else v)
          for k, v in cfg_d.items()}
    cfg = YoloConfig(**kw)
    model = YoloV5(cfg)

    @jax.jit
    def run(variables, imgs):
        raw = model.apply(variables, imgs)
        return decode_predictions(raw, cfg)

    def detector_fn(frames_u8: np.ndarray) -> List[np.ndarray]:
        H, W = frames_u8.shape[1:3]
        imgs = np.stack([cv2.resize(f, (img_size, img_size))
                         for f in frames_u8]).astype(np.float32) / 255.0
        preds = np.asarray(run(variables, jnp.asarray(imgs)))
        dets = postprocess(preds, conf_thres=conf, iou_thres=iou)
        scale = np.asarray([W / img_size, H / img_size] * 2, np.float32)
        return [np.concatenate([d[:, :4] * scale, d[:, 4:]], axis=1)
                if len(d) else d for d in dets]

    return detector_fn


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ann_file", required=True)
    parser.add_argument("--data_prefix", default=None)
    parser.add_argument("--yolo_checkpoint", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--fps", type=float, default=30)
    parser.add_argument("--timestamp_start", type=float, default=0)
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--person_class", type=int, default=0)
    parser.add_argument("--img_size", type=int, default=640)
    parser.add_argument("--max_boxes", type=int, default=32)
    args = parser.parse_args(argv)

    ds = AVADataset(args.ann_file, data_prefix=args.data_prefix)
    detector_fn = make_yolo_detector(args.yolo_checkpoint, args.img_size,
                                     args.conf)
    proposals = build_proposals(ds, detector_fn, args.fps,
                                args.timestamp_start, args.person_class,
                                args.conf, args.max_boxes)
    with open(args.out, "w") as f:
        json.dump(proposals, f)
    n = sum(len(v) for v in proposals.values())
    print(json.dumps({"keyframes": len(proposals), "boxes": n,
                      "out": args.out}))
    return proposals


if __name__ == "__main__":
    main()
