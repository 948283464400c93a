"""Batch CTV-bank construction CLI.

Parity surface for MCT/tools/ctvs/ctv_construction (raw_video_inference +
instance_level_ctv + the pipeline.sh class loop): for every video in a
list, detect concepts, build per-class masked clips in memory, embed raw +
masked in one device batch, and accumulate instance CTVs; emit symbolic
(mean) and cluster (k-means) concept banks as the npz `explain_demo`
consumes.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..api import init_recognizer
from ..data.pipelines import build_pipeline
from ..explain.ctv import (build_instance_ctvs, cluster_concept_vectors,
                           symbolic_concept_vectors)
from ..explain.masking import detect_video, per_class_masked_videos
from ..explain.model_layers import get_model_layers
from .caption_inference import DEFAULT_PIPELINE


def build_ctv_banks(model, variables, video_paths, detector_fn, class_names,
                    target_layer: int, pipeline=None, min_frames: int = 10,
                    n_clusters: int = 3):
    pipe_cfg = list(pipeline or DEFAULT_PIPELINE)
    decode_types = ("DecordInit", "SampleFrames", "DecordDecode")
    # raw frames for the detector come from the decode stage only; the
    # augment tail (resize/crop/normalize/format) re-runs on masked clips
    decode_pipe = build_pipeline(
        [c for c in pipe_cfg if c["type"] in decode_types])
    tail_pipe = build_pipeline(
        [c for c in pipe_cfg if c["type"] not in decode_types])

    instance_ctvs = {}
    for path in video_paths:
        raw = np.stack(decode_pipe({"filename": path,
                                    "start_index": 0})["imgs"])
        dets = detect_video(detector_fn, raw)
        # the reference's >10-frame noise filter assumes the FULL video
        # is decoded (detect.py); a sampled pipeline may decode fewer
        # frames than min_frames, which would make the filter
        # unsatisfiable — cap it so a concept present in every sampled
        # frame always passes
        mf = min(min_frames, len(raw) - 1)
        masked = per_class_masked_videos(raw, dets, class_names, mf)
        if not masked:
            continue

        def prep(clip_u8):
            res = tail_pipe({"imgs": list(clip_u8),
                             "clip_len": len(clip_u8), "num_clips": 1})
            return np.asarray(res["imgs"][0], np.float32)

        def embed(stack_u8):
            batch = jnp.asarray(
                np.stack([prep(clip) for clip in stack_u8]))
            _, cap = model.apply(variables, batch, (target_layer,),
                                 method="forward_with_capture")
            return np.asarray(cap[target_layer][:, 0])

        ctvs = build_instance_ctvs(embed, raw, masked)
        for concept, vec in ctvs.items():
            instance_ctvs.setdefault(concept, []).append(vec)

    if not instance_ctvs:
        raise ValueError(
            "no masked clips produced any CTVs — no detector class "
            "passed the min_frames filter on any video (check the "
            "detector checkpoint/classes and the decode pipeline's "
            "frame count)")
    sym, sym_names = symbolic_concept_vectors(instance_ctvs)
    clus, clus_names = cluster_concept_vectors(instance_ctvs, n_clusters)
    inst_names, inst_vecs = [], []
    for c, vecs in sorted(instance_ctvs.items()):
        for i, v in enumerate(vecs):
            inst_names.append(f"{c}#{i}")
            inst_vecs.append(v)
    return {
        "symbolic_matrix": sym, "symbolic_names": np.array(sym_names),
        "cluster_matrix": clus, "cluster_names": np.array(clus_names),
        "instance_matrix": np.stack(inst_vecs),
        "instance_names": np.array(inst_names),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--video_list", required=True,
                        help="text file, one video path per line")
    parser.add_argument("--detector_checkpoint", required=True)
    parser.add_argument("--class_names", required=True,
                        help="json list of detector class names")
    parser.add_argument("--output", required=True, help="npz bank path")
    parser.add_argument("--target_layer", type=int, default=None)
    parser.add_argument("--min_frames", type=int, default=10)
    args = parser.parse_args(argv)

    model, variables, cfg_d = init_recognizer(args.checkpoint)
    # configs may rely on the TimeSformerConfig default
    n_layers = cfg_d["backbone"].get("num_layers", 12)
    target = (args.target_layer if args.target_layer is not None
              else get_model_layers("timesformer", n_layers)["target"])

    from ..models.yolo import YoloConfig, YoloV5, decode_predictions, postprocess
    from ..train.checkpoint import load_checkpoint
    yv, ycfg_d, _ = load_checkpoint(args.detector_checkpoint)
    ycfg = YoloConfig(**{k: tuple(map(tuple, v)) if k == "anchors" else v
                         for k, v in ycfg_d.items()})
    yolo = YoloV5(ycfg)
    det_jit = jax.jit(lambda p, x: decode_predictions(yolo.apply(p, x), ycfg))

    def detector(frames_u8):
        x = jnp.asarray(frames_u8.astype(np.float32) / 255.0)
        return postprocess(np.asarray(det_jit(yv, x)))

    videos = [l.strip() for l in open(args.video_list) if l.strip()]
    class_names = json.load(open(args.class_names))
    banks = build_ctv_banks(model, variables, videos, detector, class_names,
                            target, min_frames=args.min_frames)
    np.savez(args.output, **banks)
    print(f"wrote banks: {[f'{k}:{v.shape}' for k, v in banks.items() if hasattr(v, 'shape')]}")
    return banks


if __name__ == "__main__":
    main()
