"""Composed retrieval end-to-end through the RN50x4 checkpoint contract.

Drives the full reference inference chain (MultiFusion/src/inference.py:
119-239) with CONVERTED torch weights: ModifiedResNet tower (layer3
middle, NCHW-buffer token order), adaptive pooling over tokens AND
channels, conv4x4 combiner mixing, directory index, top-K ranking —
all via the composed_inference CLI on real video files."""

import os

import numpy as np
import torch

from test_clip_resnet_conversion import TCLIPRN, TCombiner

from cross_modal_video_engine_tpu.cli import composed_inference
from cross_modal_video_engine_tpu.convert import (
    clip_resnet_config_from_sd, combiner_config_from_sd,
    convert_clip_resnet, convert_combiner)
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.clip_resnet import CLIPResNetConfig
from cross_modal_video_engine_tpu.models.combiner import CombinerConfig
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint
from cross_modal_video_engine_tpu.utils.bpe import write_toy_merges

rng = np.random.default_rng(991)

CFG = CLIPResNetConfig(embed_dim=24, vision_layers=(1, 1, 1, 1),
                       vision_width=16, image_resolution=64,
                       context_length=12, vocab_size=800,
                       text_width=16, text_heads=2, text_layers=1)


def test_composed_cli_with_converted_rn50x4(tmp_path):
    torch.manual_seed(13)
    tm = TCLIPRN(CFG).eval()
    sd = tm.state_dict()
    derived = clip_resnet_config_from_sd(sd)
    # tiny dims break the //64 head heuristics; pin them to the test cfg
    derived.update(text_heads=CFG.text_heads, context_length=12,
                   vocab_size=800)
    cfg = CLIPResNetConfig(**derived)
    clip_vars = convert_clip_resnet(sd, cfg)
    clip_ckpt = str(tmp_path / "clip_ckpt")
    save_checkpoint(clip_ckpt, clip_vars, cfg, {"model_type": "clip_resnet"})

    tc = TCombiner(CFG.embed_dim, 16, 20).eval()
    comb_kwargs = combiner_config_from_sd(tc.state_dict())
    assert comb_kwargs["middle_mix"] == "conv4x4"
    comb_vars = convert_combiner(tc.state_dict())
    comb_ckpt = str(tmp_path / "comb_ckpt")
    save_checkpoint(comb_ckpt, comb_vars, CombinerConfig(**comb_kwargs))

    videos_dir = str(tmp_path / "videos")
    os.makedirs(videos_dir)
    names = [f"cand{i}.mp4" for i in range(3)]
    for name in names:
        frames = rng.integers(0, 255, (24, 48, 48, 3)).astype(np.uint8)
        write_test_video(os.path.join(videos_dir, name), frames)
    ref = str(tmp_path / "ref.mp4")
    write_test_video(ref, rng.integers(0, 255, (24, 48, 48, 3),
                                       dtype=np.uint8))

    merges = str(tmp_path / "merges.txt")
    write_toy_merges(merges, ["make the video red"], n_merges=16)

    out_dir = str(tmp_path / "out")
    top = composed_inference.main([
        "--input_vdo", ref, "--input_modified_text", "make the video red",
        "--videos_dir", videos_dir, "--clip_checkpoint", clip_ckpt,
        "--combiner_checkpoint", comb_ckpt, "--merges", merges,
        "--topK", "3", "--output_dir", out_dir])
    assert len(top) == 3 and set(top) == set(names)
    assert os.path.exists(os.path.join(out_dir, top[0]))

    # --- torch replica of the reference inference chain on the SAME
    # decoded+preprocessed inputs -> the ranking must match exactly
    import torch.nn.functional as tF
    import jax.numpy as jnp
    from cross_modal_video_engine_tpu.io.video_decode import open_video
    from cross_modal_video_engine_tpu.ops.preprocess import clip_preprocess
    from cross_modal_video_engine_tpu.utils.bpe import BPETokenizer

    def torch_feats(path):
        reader = open_video(path)
        idx = list(range(0, len(reader), 8))[:64]
        frames = reader.get_batch(idx)
        reader.release()
        pre = np.asarray(clip_preprocess(jnp.asarray(frames), dim=64),
                         np.float32)
        with torch.no_grad():
            high, middle = tm.visual(
                torch.from_numpy(pre.transpose(0, 3, 1, 2)))
        return high, middle

    rh, rm = torch_feats(ref)
    F_ = rh.shape[0]
    # inference.py:58-59: no-transpose NCHW view + adaptive pool
    mid = rm.reshape(1, F_, rm.shape[2] * rm.shape[3], rm.shape[1])
    mid = tF.adaptive_avg_pool2d(mid, (16, CFG.embed_dim))
    mid = tF.adaptive_avg_pool3d(mid[None], (8, 16, CFG.embed_dim))[0]
    high8 = tF.adaptive_avg_pool1d(rh.T[None], 8)[0].T

    tok = BPETokenizer(merges)
    ids = np.asarray(tok.tokenize("make the video red", 12))
    with torch.no_grad():
        text = tm.encode_text(torch.from_numpy(ids.astype(np.int64)))
        pred = tc.combine((high8[None], mid), text)
        index = torch.stack([
            tF.normalize(torch_feats(os.path.join(videos_dir, n))[0]
                         .mean(0, keepdim=True)[0], dim=-1)
            for n in names])
        scores = 1 - pred @ index.T
    torch_order = [names[i] for i in scores[0].argsort().tolist()]
    assert top == torch_order, (top, torch_order)
