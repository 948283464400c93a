"""Misc / deployment tools (MCT/tools/misc + tools/deployment equivalents).

  flow_extraction — video -> quantized optical-flow rawframes
      (misc/flow_extraction.py:10-123; this image's cv2 build has no
      TVL1/optflow contrib, so Farneback — the reference's own fallback
      `method='farneback'` — is the implementation; identical
      clip-to-[-bound,bound] uint8 quantization and flow_x/flow_y naming)
  bsn_pgm         — TEM result curves -> PGM proposals csv + BSP feature
      npy per video, the exact LoadProposals input contract
      (misc/bsn_proposal_generation.py:32-157)
  publish_model   — stamp a checkpoint file with its sha256 prefix
      (deployment/publish_model.py)
  export_model    — serialize the jitted video-embedding forward with
      jax.export (StableHLO) for serving — the TPU-native counterpart of
      deployment/pytorch2onnx.py; exported for both cpu and tpu
      platforms, params baked in as constants.

Usage: python -m cross_modal_video_engine_tpu.cli.misc_tools CMD ...
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np


def flow_extraction(args):
    import cv2

    from ..io.native import NativeVideoReader

    reader = NativeVideoReader(args.input)
    n = len(reader)
    os.makedirs(args.dest, exist_ok=True)
    bound = args.bound
    # stream in bounded chunks (whole-video decode would OOM long
    # inputs); keep one frame of overlap for the i -> i+1 flow pair
    chunk = 256
    prev_rgb = prev_gray = None
    written = 0
    for base in range(0, n, chunk):
        frames = reader.get_batch(list(range(base, min(base + chunk, n))))
        for off, frame in enumerate(frames):
            g = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
            if prev_gray is not None:
                i = base + off - 1
                flow = cv2.calcOpticalFlowFarneback(
                    prev_gray, g, None, 0.5, 3, 15, 3, 5, 1.2, 0)
                q = np.clip(flow, -bound, bound)
                q = ((q + bound) * (255.0 / (2 * bound))).astype(np.uint8)
                cv2.imwrite(os.path.join(args.dest, f"flow_x_{i:05d}.jpg"),
                            q[..., 0])
                cv2.imwrite(os.path.join(args.dest, f"flow_y_{i:05d}.jpg"),
                            q[..., 1])
                if args.save_rgb:
                    cv2.imwrite(os.path.join(args.dest, f"img_{i:05d}.jpg"),
                                prev_rgb[..., ::-1])
                written += 1
            prev_gray, prev_rgb = g, frame
    reader.release()
    print(f"wrote {written} flow frame pairs to {args.dest}")


def bsn_pgm(args):
    """TEM curves (<tem_dir>/<vid>.npz: action/start/end (T,)) + optional
    ActivityNet-style gt json -> per-video proposals csv
    (tmin,tmax,tmin_score,tmax_score,score,match_iou) + BSP features."""
    from ..data.datasets_extra import ActivityNetDataset
    from ..metrics.proposals import pairwise_temporal_iou
    from ..models.bsn import match_boundaries, proposal_features

    gt_by_video = {}
    if args.ann_file:
        ds = ActivityNetDataset(args.ann_file, feature_prefix="",
                                temporal_dim=1)
        gt_by_video = {v["video"]: v["segments"] for v in ds.videos}

    os.makedirs(args.proposals_dir, exist_ok=True)
    os.makedirs(args.features_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(args.tem_dir)):
        if not name.endswith(".npz"):
            continue
        vid = name[:-4]
        tem = np.load(os.path.join(args.tem_dir, name))
        action, start, end = tem["action"], tem["start"], tem["end"]
        T = len(action)
        props = match_boundaries(start, end,
                                 max_proposals=args.max_proposals)
        if props.size == 0:
            # still write the files: the PEM dataset LoadProposals
            # np.loadtxt's every annotated video's csv — a missing file
            # would crash training mid-epoch.  One zero-score full-span
            # placeholder row keeps the contract.
            rows = np.asarray([[0.0, 1.0, 0.0, 0.0, 0.0, 0.0]],
                              np.float32)
            np.savetxt(os.path.join(args.proposals_dir, vid + ".csv"),
                       rows, delimiter=",", fmt="%.6f",
                       header="tmin,tmax,tmin_score,tmax_score,score,"
                              "match_iou")
            np.save(os.path.join(args.features_dir, vid + ".npy"),
                    proposal_features(
                        action, np.asarray([[0, T - 1, 0.0]],
                                           np.float32)))
            count += 1
            continue
        tmin, tmax = props[:, 0] / T, props[:, 1] / T
        rows = np.stack([
            tmin, tmax,
            start[props[:, 0].astype(int)],
            end[props[:, 1].astype(int)],
            props[:, 2],
            np.zeros(len(props), np.float32),
        ], axis=1)
        gt = gt_by_video.get(vid)
        if gt is not None and len(gt):
            iou, = (pairwise_temporal_iou(rows[:, :2], gt),)
            rows[:, 5] = iou.max(axis=0)
        np.savetxt(os.path.join(args.proposals_dir, vid + ".csv"), rows,
                   delimiter=",", fmt="%.6f",
                   header="tmin,tmax,tmin_score,tmax_score,score,match_iou")
        np.save(os.path.join(args.features_dir, vid + ".npy"),
                proposal_features(action, props))
        count += 1
    print(f"generated proposals for {count} videos")


def publish_model(args):
    with open(args.input, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    root, ext = os.path.splitext(args.input)
    out = f"{root}-{digest}{ext}"
    os.replace(args.input, out)
    print(out)
    return out


def export_model(args):
    import jax
    import jax.numpy as jnp

    from ..models.clip import CLIPConfig, CLIPModel

    if args.preset == "tiny":
        cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=32,
                         vision_layers=2, vision_heads=2, patch_size=16,
                         context_length=8, vocab_size=64, text_width=16,
                         text_heads=2, text_layers=1)
    else:
        cfg = CLIPConfig(dtype="bfloat16")
    model = CLIPModel(cfg)
    B, F, R = args.batch, args.frames, cfg.image_resolution
    frames = jnp.zeros((B, F, R, R, 3), jnp.float32)
    rng = np.random.default_rng(0)
    if args.checkpoint:
        from ..train.checkpoint import load_checkpoint
        variables, _cfg, _meta = load_checkpoint(args.checkpoint)
    else:
        shapes = jax.eval_shape(
            lambda k: model.init(k, frames[:, 0],
                                 jnp.zeros((1, cfg.context_length),
                                           jnp.int32)),
            jax.random.key(0))
        variables = jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape).astype(np.float32) * 0.02,
                s.dtype), shapes)

    # weights ride as a call ARGUMENT (like export_yolo below): closing
    # over them would bake hundreds of MB of constants into the
    # StableHLO body, which the axon remote-compile service rejects
    def forward(v, x):
        high, _ = model.apply(v, x, method="encode_video")
        return high

    exported = jax.export.export(
        jax.jit(forward), platforms=("cpu", "tpu"))(
            jax.eval_shape(lambda: variables),
            jax.ShapeDtypeStruct(frames.shape, frames.dtype))
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    print(json.dumps({"output": args.output, "bytes": len(blob),
                      "in_shape": list(frames.shape),
                      "platforms": ["cpu", "tpu"]}))


def export_yolo(args):
    """StableHLO export of the YOLOv5 detector forward+decode — the
    TPU-native counterpart of MCT/yolov5/export.py (which serializes
    TorchScript/ONNX/TF graphs of Detect-fused models).  The exported
    artifact maps (B, S, S, 3) float images in [0,1] to decoded
    (B, N, 5+nc[+nm]) predictions (+ (B, Hm, Wm, npr) prototype maps
    for masks>0 models); NMS stays host-side like the reference's
    exported graphs."""
    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..models.yolo import decode_predictions
    from .yolo_train import build_yolo_model

    cfg = Config.fromfile(args.config)
    model = build_yolo_model(cfg)
    size = model.cfg.img_size
    images = jnp.zeros((args.batch, size, size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), images[:1], train=False)
    if args.checkpoint:
        from ..train.checkpoint import load_checkpoint
        variables, _, _ = load_checkpoint(
            args.checkpoint, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]})
    seg = model.cfg.masks > 0

    def forward(v, x):
        out = model.apply(v, x, train=False)
        if seg:
            maps, proto = out
            return decode_predictions(maps, model.cfg), proto
        return decode_predictions(out, model.cfg)

    exported = jax.export.export(
        jax.jit(forward), platforms=("cpu", "tpu"))(
            jax.eval_shape(lambda: variables),
            jax.ShapeDtypeStruct(images.shape, images.dtype))
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    print(json.dumps({"output": args.output, "bytes": len(blob),
                      "in_shape": list(images.shape), "seg": seg,
                      "platforms": ["cpu", "tpu"]}))


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("flow_extraction")
    p.add_argument("--input", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--bound", type=float, default=20.0)
    p.add_argument("--save_rgb", action="store_true")
    p.set_defaults(fn=flow_extraction)

    p = sub.add_parser("bsn_pgm")
    p.add_argument("--tem_dir", required=True)
    p.add_argument("--proposals_dir", required=True)
    p.add_argument("--features_dir", required=True)
    p.add_argument("--ann_file", default=None)
    p.add_argument("--max_proposals", type=int, default=200)
    p.set_defaults(fn=bsn_pgm)

    p = sub.add_parser("publish_model")
    p.add_argument("--input", required=True)
    p.set_defaults(fn=publish_model)

    p = sub.add_parser("export_model")
    p.add_argument("--output", required=True)
    p.add_argument("--preset", choices=("tiny", "vitb32"), default="vitb32")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=8)
    p.set_defaults(fn=export_model)

    p = sub.add_parser("export_yolo")
    p.add_argument("config")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.set_defaults(fn=export_yolo)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main() or 0)
