"""Composed text+video retrieval CLI.

Parity surface for MultiFusion/src/inference.py:119-239: given a reference
video file and a modification text, extract CLIP features live, fuse with
the Combiner, rank an index of candidate videos, report (and optionally
copy) the top hit.

Usage:
  python -m cross_modal_video_engine_tpu.cli.composed_inference \
      --input_vdo ref.mp4 --input_modified_text "make it red" \
      --videos_dir dataset/videos --clip_checkpoint CKPT \
      --combiner_checkpoint CKPT2 --merges merges.txt
"""

from __future__ import annotations

import argparse
import os
import shutil
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.composed_dataset import pool_middle_feature, save_video_features
from ..io.video_decode import open_video
from ..models.clip import (CLIPConfig, CLIPModel,
                           enable_fused_inference)
from ..models.combiner import Combiner, CombinerConfig
from ..ops.preprocess import clip_preprocess
from ..train.checkpoint import load_checkpoint
from ..utils.bpe import BPETokenizer


def extract_video_features(clip_model, variables, path: str,
                           stride: int = 8, dim: int = 224,
                           max_frames: int = 64
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """MultiFusion utils.extract_vdo_features (utils.py:22-29): decode
    every `stride`-th frame, CLIP-preprocess, encode.  All sampled frames
    are encoded in ONE device batch (the reference loops per frame)."""
    reader = open_video(path)
    idx = list(range(0, len(reader), stride))[:max_frames]
    frames = reader.get_batch(idx)                 # (F, H, W, 3) u8
    reader.release()
    pre = clip_preprocess(jnp.asarray(frames), dim=dim)
    high, middle = clip_model.apply(variables, pre, method="encode_image")
    return np.asarray(high, np.float32), np.asarray(middle, np.float32)


def build_combiner_inputs(high: np.ndarray, middle: np.ndarray,
                          frames: int = 8, tokens: int = 16,
                          dim: Optional[int] = None):
    """adaptive-avg-pool middle to (frames, tokens, dim or D), high to
    (frames, D) (reference inference.py:58-59; for RN50x4 middles the
    channel axis pools 1280 -> 640 too)."""
    from ..data.composed_dataset import adaptive_avg_pool_axis
    h = adaptive_avg_pool_axis(high, frames, axis=0)
    m = pool_middle_feature(middle, frames, tokens, dim=dim)
    return h, m


def rank_index(combiner, comb_vars, ref_high, ref_middle, text_feat,
               index_high: np.ndarray) -> np.ndarray:
    pred = combiner.apply(comb_vars, (jnp.asarray(ref_high[None]),
                                      jnp.asarray(ref_middle[None])),
                          jnp.asarray(text_feat),
                          method="combine_features")
    index = index_high.mean(axis=1)
    index = index / np.maximum(np.linalg.norm(index, axis=1, keepdims=True),
                               1e-12)
    scores = 1.0 - np.asarray(pred) @ index.T      # distances, lower=better
    return np.argsort(scores[0])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_vdo", required=True)
    parser.add_argument("--input_modified_text", required=True)
    parser.add_argument("--videos_dir", required=True)
    parser.add_argument("--clip_checkpoint", required=True)
    parser.add_argument("--combiner_checkpoint", required=True)
    parser.add_argument("--merges", required=True)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--topK", type=int, default=1)
    parser.add_argument("--feature_cache", default=None)
    args = parser.parse_args(argv)

    clip_vars, clip_cfg_d, _ = load_checkpoint(args.clip_checkpoint)
    if "patch_size" in clip_cfg_d:
        clip_cfg = enable_fused_inference(
            CLIPConfig(**clip_cfg_d))   # TPU: headline fused program
        clip_model = CLIPModel(clip_cfg)
    else:   # ModifiedResNet tower (RN50x4 contract, inference.py:179-196)
        from ..models.clip_resnet import CLIPResNetConfig, CLIPResNetModel
        clip_cfg_d["vision_layers"] = tuple(clip_cfg_d["vision_layers"])
        clip_cfg = CLIPResNetConfig(**clip_cfg_d)
        clip_model = CLIPResNetModel(clip_cfg)
    comb_vars, comb_cfg_d, _ = load_checkpoint(args.combiner_checkpoint)
    comb_cfg = CombinerConfig(**comb_cfg_d)
    combiner = Combiner(comb_cfg)
    tok = BPETokenizer(args.merges)

    # reference video features (live extraction)
    rh, rm = extract_video_features(clip_model, clip_vars, args.input_vdo,
                                    dim=clip_cfg.image_resolution)
    ref_high, ref_middle = build_combiner_inputs(
        rh, rm, dim=comb_cfg.clip_feature_dim)

    # text features
    ids = jnp.asarray(tok.tokenize(args.input_modified_text,
                                   clip_cfg.context_length))
    text_feat = np.asarray(clip_model.apply(clip_vars, ids,
                                            method="encode_text"))

    # candidate index over all videos in the dir
    names = sorted(f for f in os.listdir(args.videos_dir)
                   if f.split(".")[-1].lower() in ("mp4", "avi", "mkv",
                                                   "webm", "mov"))
    index_high = []
    for name in names:
        cache = (os.path.join(args.feature_cache, name + ".npz")
                 if args.feature_cache else None)
        if cache and os.path.exists(cache):
            d = np.load(cache)
            h = d["high_feature"]
        else:
            h, m = extract_video_features(
                clip_model, clip_vars, os.path.join(args.videos_dir, name),
                dim=clip_cfg.image_resolution)
            if cache:
                os.makedirs(args.feature_cache, exist_ok=True)
                save_video_features(cache, h, m)
        hh, _ = build_combiner_inputs(h, np.zeros((1, 1, h.shape[-1]),
                                                  np.float32))
        index_high.append(hh)
    index_high = np.stack(index_high)

    order = rank_index(combiner, comb_vars, ref_high, ref_middle, text_feat,
                       index_high)
    for i in order[: args.topK]:
        print(names[i])
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        shutil.copy(os.path.join(args.videos_dir, names[order[0]]),
                    os.path.join(args.output_dir, names[order[0]]))
    return [names[i] for i in order[: args.topK]]


if __name__ == "__main__":
    main()
