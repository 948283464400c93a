"""Explainable recognition demo CLI.

Parity surface for MCT/tools/ctvs/inference_demo.py:283-321: classify a
video, extract the target-layer gradient probe, optionally run the
detector to build per-concept masked clips + per-video CTVs, and print
top concepts at every available interpretation level.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipelines import build_pipeline
from ..explain.pipeline import ConceptBank, explain_video
from ..models.recognizer import Recognizer3D
from ..models.timesformer import TimeSformerConfig
from ..train.checkpoint import load_checkpoint
from .caption_inference import DEFAULT_PIPELINE


def load_concept_banks(path: str):
    """npz with arrays '<level>_matrix' and json lists '<level>_names'."""
    data = np.load(path, allow_pickle=True)
    banks = {}
    for key in data.files:
        if key.endswith("_matrix"):
            level = key[: -len("_matrix")]
            names = list(data[f"{level}_names"])
            banks[level] = ConceptBank(np.asarray(data[key], np.float32),
                                       [str(n) for n in names])
    return banks


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--target_video_path", required=True)
    parser.add_argument("--concept_banks", default=None,
                        help="npz of {level}_matrix / {level}_names")
    parser.add_argument("--target_layer", type=int, default=10)
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--label_names", default=None)
    args = parser.parse_args(argv)

    variables, cfg_d, _ = load_checkpoint(args.checkpoint)
    from ..utils.precision import maybe_cast_bf16
    variables = maybe_cast_bf16(variables, cfg_d)
    ts_cfg = TimeSformerConfig(**{k: tuple(v) if isinstance(v, list) else v
                                  for k, v in cfg_d["backbone"].items()})
    model = Recognizer3D(ts_cfg, num_classes=cfg_d["num_classes"])

    pipe = build_pipeline(DEFAULT_PIPELINE)
    r = pipe({"filename": args.target_video_path, "start_index": 0})
    clips = jnp.asarray(np.asarray(r["imgs"], np.float32))

    banks = load_concept_banks(args.concept_banks) if args.concept_banks else {}
    out = explain_video(model, variables, clips,
                        target_layer=args.target_layer, concept_banks=banks,
                        topk=args.topk)
    names = json.load(open(args.label_names)) if args.label_names else None
    pred = int(out["pred"][0])
    print(f"prediction: {names[pred] if names else pred}")
    for level in banks:
        print(f"[{level}] top concepts:")
        for name, score in out[f"{level}_top"]:
            print(f"  {name}\t{score:+.4f}")
    return out


if __name__ == "__main__":
    main()
