"""Torch checkpoint importers.

Converts reference-format torch checkpoints into this framework's flax
variable trees so published weights run on TPU:

* `convert_linas_dual_encoding` — LINAS .pth.tar checkpoints ('model' is a
  LIST of sub-state-dicts in BaseModel.state_dict order,
  LINAS-engine/model.py:385-403);
* `convert_clip_vit` — OpenAI-layout CLIP ViT state dicts (the format the
  MultiFusion vendored clip.load produces);
* plus RN50x4 (`convert_clip_resnet`), Combiner, YOLOv5, TimeSformer,
  Swin3D, ResNet3D/SlowOnly, SlowFast, X3D, CSN (ir/ip), TSM, VideoMAE
  and the RNN caption head — every converter parity-tested against a
  torch replica (tests/test_*_conversion.py).

Intentionally without an importer: only backbones whose reference
implementation wraps an UN-VENDORED external package, so checkpoint
parity would target code outside the tree — MViT (mvit.py:22-33
imports facebook `slowfast`'s MultiScaleBlock etc.) and VideoCLIP
(videoclip.py:11 imports fairseq `mmpt.models.MMPTModel`); our
models/mvit.py and models/videoclip.py are the TPU-first counterparts.
TIN imports via `convert_tin` into the exact TINResNetExact rebuild.
Round 3 adds `convert_c3d`, `convert_r2plus1d` (factorized Conv2plus1d
grammar incl. downsamples), `convert_mobilenetv2_tsm`
(TemporalShift-wrapped ConvModules), `convert_stgcn` / `convert_agcn`
(graph buffers into cfg.adjacency), `convert_tanet` (exact TAM) and
`convert_tpn` (the neck), and the audio family imports through
`convert_tsm` (the shipped audio recipes use a plain 2D ResNet,
tsn_r50_audio.py) — 23 importer families total, every one
parity-tested.

All converters are pure dict->dict transforms over numpy arrays; torch is
only needed to unpickle .pth files (`load_torch_checkpoint`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def load_torch_checkpoint(path: str):
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


# --------------------------------------------------------------------------
# LINAS Dual_Encoding
# --------------------------------------------------------------------------

def _gru(sd: Dict, prefix: str = "rnn.") -> Dict:
    """torch GRU (gate order r|z|n) -> BiGRU params (same gate order)."""
    out = {}
    for dirname, suffix in (("fwd", ""), ("bwd", "_reverse")):
        out[f"{dirname}_wi"] = _np(sd[f"{prefix}weight_ih_l0{suffix}"]).T
        out[f"{dirname}_bi"] = _np(sd[f"{prefix}bias_ih_l0{suffix}"])
        out[f"{dirname}_wh"] = _np(sd[f"{prefix}weight_hh_l0{suffix}"]).T
        out[f"{dirname}_bh"] = _np(sd[f"{prefix}bias_hh_l0{suffix}"])
    return out


def _convbank(sd: Dict, kernel_sizes) -> Dict:
    """torch ModuleList of Conv2d(1, K, (ws, C)) -> ConvBank1D params."""
    out = {}
    for i, ws in enumerate(kernel_sizes):
        w = _np(sd[f"convs1.{i}.weight"])          # (K, 1, ws, C)
        out[f"conv_w{ws}"] = {
            "kernel": w[:, 0].transpose(1, 2, 0),  # (ws, C, K)
            "bias": _np(sd[f"convs1.{i}.bias"]),
        }
    return out


def _dense(sd: Dict, name: str) -> Dict:
    return {"kernel": _np(sd[f"{name}.weight"]).T,
            "bias": _np(sd[f"{name}.bias"])}


def _latent_mapping(sd: Dict):
    """Latent_mapping (MFC fc1 + BN) -> (params, batch_stats)."""
    params = {"mapping": {"fc1": _dense(sd, "mapping.fc1")}}
    stats = {}
    if "mapping.bn_1.weight" in sd:
        params["mapping"]["bn_1"] = {
            "scale": _np(sd["mapping.bn_1.weight"]),
            "bias": _np(sd["mapping.bn_1.bias"]),
        }
        stats = {"mapping": {"bn_1": {
            "mean": _np(sd["mapping.bn_1.running_mean"]),
            "var": _np(sd["mapping.bn_1.running_var"]),
        }}}
    # residual fc blocks (text_resblock_number > 0)
    i = 2
    while f"mapping.fc{i}.weight" in sd:
        params["mapping"][f"fc{i}"] = _dense(sd, f"mapping.fc{i}")
        i += 1
    return params, stats


def _video_encoding(sd: Dict, kernel_sizes) -> Dict:
    return {"rnn": _gru(sd), "convs": _convbank(sd, kernel_sizes)}


def _text_encoding(sd: Dict, kernel_sizes, with_support: bool) -> Dict:
    out = {
        "embed": {"embedding": _np(sd["embed.weight"])},
        "rnn": _gru(sd),
        "convs": _convbank(sd, kernel_sizes),
    }
    if with_support and "k.weight" in sd:
        out["k"] = _dense(sd, "k")
        out["q"] = _dense(sd, "q")
    return out


def convert_linas_dual_encoding(state_dicts: List[Optional[Dict]], cfg
                                ) -> Dict:
    """state_dicts: checkpoint['model'] (list of 8-9 sub state dicts,
    BaseModel.state_dict order: vid_enc, text_enc, vid_map, text_map,
    student_text_map, student_text_enc, student_vid_map, student_vid_enc).
    cfg: DualEncodingConfig.  Returns flax `variables`."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(name, p, s=None):
        params[name] = p
        if s:
            stats[name] = s

    vk, tk = cfg.visual_kernel_sizes, cfg.text_kernel_sizes
    put("vid_encoding", _video_encoding(state_dicts[0], vk))
    put("text_encoding",
        _text_encoding(state_dicts[1], tk,
                       with_support=cfg.teacher_model != "student"))
    p, s = _latent_mapping(state_dicts[2])
    put("vid_mapping", p, s)
    p, s = _latent_mapping(state_dicts[3])
    put("text_mapping", p, s)
    if len(state_dicts) > 4 and state_dicts[4]:
        p, s = _latent_mapping(state_dicts[4])
        put("student_text_mapping", p, s)
    if len(state_dicts) > 5 and state_dicts[5]:
        put("student_text_encoding",
            _text_encoding(state_dicts[5], tk, with_support=False))
    if len(state_dicts) > 6 and state_dicts[6]:
        p, s = _latent_mapping(state_dicts[6])
        put("student_vid_mapping", p, s)
    if len(state_dicts) > 7 and state_dicts[7]:
        put("student_vid_encoding", _video_encoding(state_dicts[7], vk))
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# --------------------------------------------------------------------------
# RNNDecoderHead (caption head)
# --------------------------------------------------------------------------

def convert_rnn_decoder_head(sd: Dict, prefix: str = "cls_head.") -> Dict:
    """Reference RNNDecoderHead state dict (decoder_head.py:49-120:
    rnn=GRU(dim_hidden+num_classes, dim_hidden), start_emb=Embedding(1,C),
    out=Linear) -> flax RNNDecoderHead params."""
    return {
        "start_emb": _np(sd[f"{prefix}start_emb.weight"]),
        "rnn_wi": _np(sd[f"{prefix}rnn.weight_ih_l0"]).T,
        "rnn_bi": _np(sd[f"{prefix}rnn.bias_ih_l0"]),
        "rnn_wh": _np(sd[f"{prefix}rnn.weight_hh_l0"]).T,
        "rnn_bh": _np(sd[f"{prefix}rnn.bias_hh_l0"]),
        "out_kernel": _np(sd[f"{prefix}out.weight"]).T,
        "out_bias": _np(sd[f"{prefix}out.bias"]),
    }


# --------------------------------------------------------------------------
# TimeSformer (mmaction layout)
# --------------------------------------------------------------------------

def _mha_from_inproj(sd: Dict, prefix: str) -> Dict:
    """torch MultiheadAttention in_proj -> q/k/v/out Dense params."""
    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    D = w.shape[1]
    return {
        "q_proj": {"kernel": w[:D].T, "bias": b[:D]},
        "k_proj": {"kernel": w[D:2 * D].T, "bias": b[D:2 * D]},
        "v_proj": {"kernel": w[2 * D:].T, "bias": b[2 * D:]},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


# (LayerNorm split shared with _ln below; kept as one definition)


def convert_timesformer(sd: Dict, cfg, cls_head_key: str = "cls_head.fc_cls",
                        backbone_prefix: str = "backbone.") -> Dict:
    """mmaction TimeSformer (divided_space_time) state dict -> flax
    variables for models.recognizer.Recognizer3D.

    Layer naming follows the mmcv BaseTransformerLayer layout the MCT
    checkpoints use:
      transformer_layers.layers.{i}.attentions.0.*  (temporal, w/ norm +
        temporal_fc), attentions.1.* (spatial, w/ norm),
      ffns.0.{norm, layers.0.0, layers.1}.
    """
    bp = backbone_prefix
    backbone: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _np(sd[f"{bp}patch_embed.projection.weight"])
            .transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{bp}patch_embed.projection.bias"]),
        },
        "cls_token": _np(sd[f"{bp}cls_token"]),
        "pos_embed": _np(sd[f"{bp}pos_embed"]),
        "time_embed": _np(sd[f"{bp}time_embed"]),
        "norm": _ts_ln(sd, f"{bp}norm"),
    }
    i = 0
    while f"{bp}transformer_layers.layers.{i}.attentions.0.attn.in_proj_weight" in sd:
        lp = f"{bp}transformer_layers.layers.{i}"
        backbone[f"block_{i}"] = {
            "temporal_norm": _ts_ln(sd, f"{lp}.attentions.0.norm"),
            "temporal_attn": _mha_from_inproj(sd, f"{lp}.attentions.0.attn"),
            "temporal_fc": _dense(sd, f"{lp}.attentions.0.temporal_fc"),
            "spatial_norm": _ts_ln(sd, f"{lp}.attentions.1.norm"),
            "spatial_attn": _mha_from_inproj(sd, f"{lp}.attentions.1.attn"),
            "ffn_norm": _ts_ln(sd, f"{lp}.ffns.0.norm"),
            "ffn_fc1": _dense(sd, f"{lp}.ffns.0.layers.0.0"),
            "ffn_fc2": _dense(sd, f"{lp}.ffns.0.layers.1"),
        }
        i += 1

    params: Dict[str, Any] = {"backbone": backbone}
    if cls_head_key and f"{cls_head_key}.weight" in sd:
        params["cls_head"] = {"fc_cls": _dense(sd, cls_head_key)}
    return {"params": params}


# --------------------------------------------------------------------------
# Video Swin (mmaction swin_transformer.py layout)
# --------------------------------------------------------------------------

def convert_swin3d(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                   cls_head_key: str = "cls_head.fc_cls") -> Dict:
    """mmaction Video Swin state dict -> flax variables for
    models.swin3d.Swin3D (layer naming: patch_embed.proj/norm,
    layers.{i}.blocks.{j}.{norm1,attn.qkv,attn.proj,
    attn.relative_position_bias_table,norm2,mlp.fc1,mlp.fc2},
    layers.{i}.downsample.{norm,reduction}, norm).  The
    relative_position_index buffers are recomputed on our side (the
    canonical formula), so only the bias TABLE transfers."""
    bp = backbone_prefix

    def ln(name):
        return {"scale": _np(sd[f"{name}.weight"]),
                "bias": _np(sd[f"{name}.bias"])}

    params: Dict[str, Any] = {
        "patch_embed": {
            # Conv3d (C, 3, t, h, w) -> flax (t, h, w, 3, C)
            "kernel": _np(sd[f"{bp}patch_embed.proj.weight"])
            .transpose(2, 3, 4, 1, 0),
            "bias": _np(sd[f"{bp}patch_embed.proj.bias"]),
        },
        "patch_norm": ln(f"{bp}patch_embed.norm"),
        "norm": ln(f"{bp}norm"),
    }
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            p = f"{bp}layers.{i}.blocks.{j}"
            params[f"stage{i}_block{j}"] = {
                "norm1": ln(f"{p}.norm1"),
                "norm2": ln(f"{p}.norm2"),
                "attn": {
                    "qkv": _dense(sd, f"{p}.attn.qkv"),
                    "proj": _dense(sd, f"{p}.attn.proj"),
                    "rel_pos_bias": _np(
                        sd[f"{p}.attn.relative_position_bias_table"]),
                },
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
            }
        if f"{bp}layers.{i}.downsample.reduction.weight" in sd:
            params[f"merge{i}"] = {
                "norm": ln(f"{bp}layers.{i}.downsample.norm"),
                "reduction": {
                    "kernel": _np(
                        sd[f"{bp}layers.{i}.downsample.reduction.weight"]).T,
                },
            }
    out: Dict[str, Any] = {"backbone": params}
    if cls_head_key and f"{cls_head_key}.weight" in sd:
        out["cls_head"] = {"fc_cls": _dense(sd, cls_head_key)}
        return {"params": out}
    return {"params": params}


# --------------------------------------------------------------------------
# CLIP ViT (OpenAI layout)
# --------------------------------------------------------------------------

def _ln(sd: Dict, name: str) -> Dict:
    return {"ln": {"scale": _np(sd[f"{name}.weight"]),
                   "bias": _np(sd[f"{name}.bias"])}}


_ts_ln = _ln


def _resblock(sd: Dict, prefix: str) -> Dict:
    D = _np(sd[f"{prefix}.attn.in_proj_weight"]).shape[1]
    in_w = _np(sd[f"{prefix}.attn.in_proj_weight"])     # (3D, D)
    in_b = _np(sd[f"{prefix}.attn.in_proj_bias"])
    qw, kw, vw = in_w[:D], in_w[D:2 * D], in_w[2 * D:]
    qb, kb, vb = in_b[:D], in_b[D:2 * D], in_b[2 * D:]
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": _dense(sd, f"{prefix}.attn.out_proj"),
        },
        "c_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
    }


def convert_clip_vit(sd: Dict, cfg) -> Dict:
    """sd: OpenAI CLIP state dict (ViT visual tower).  cfg: CLIPConfig.
    Returns flax variables for models.clip.CLIPModel."""
    visual = {
        "conv1": {"kernel": _np(sd["visual.conv1.weight"])
                  .transpose(2, 3, 1, 0)},               # (p,p,3,width)
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": _np(sd["visual.proj"]),
        "transformer": {},
    }
    for i in range(cfg.vision_layers):
        visual["transformer"][f"resblock_{i}"] = _resblock(
            sd, f"visual.transformer.resblocks.{i}")

    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
        "transformer": {},
    }
    for i in range(cfg.text_layers):
        text["transformer"][f"resblock_{i}"] = _resblock(
            sd, f"transformer.resblocks.{i}")

    return {"params": {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]),
    }}


# --------------------------------------------------------------------------
# CLIP ModifiedResNet (OpenAI layout, e.g. RN50x4 — the checkpoint
# MultiFusion inference loads, MultiFusion/src/inference.py:179-196)
# --------------------------------------------------------------------------

def _bn(sd: Dict, name: str):
    """torch BatchNorm2d -> (params, batch_stats)."""
    return ({"scale": _np(sd[f"{name}.weight"]),
             "bias": _np(sd[f"{name}.bias"])},
            {"mean": _np(sd[f"{name}.running_mean"]),
             "var": _np(sd[f"{name}.running_var"])})


def _conv(sd: Dict, name: str) -> Dict:
    """torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O), no bias."""
    return {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}


def _bottleneck(sd: Dict, prefix: str):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv(sd, f"{prefix}.conv{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
    if f"{prefix}.downsample.0.weight" in sd:
        params["conv_down"] = _conv(sd, f"{prefix}.downsample.0")
        params["bn_down"], stats["bn_down"] = _bn(sd,
                                                  f"{prefix}.downsample.1")
    return params, stats


def clip_resnet_config_from_sd(sd: Dict) -> Dict[str, Any]:
    """Derive CLIPResNetConfig kwargs from an OpenAI CLIP-RN state dict
    (counts/widths read off shapes, like the reference clip.load's
    build_model)."""
    def n_blocks(layer):
        i = 0
        while f"visual.layer{layer}.{i}.conv1.weight" in sd:
            i += 1
        return i

    width = int(sd["visual.conv1.weight"].shape[0]) * 2
    embed_dim = int(_np(sd["text_projection"]).shape[1])
    spatial = int(round(
        (_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1)
        ** 0.5))
    text_width = int(_np(sd["ln_final.weight"]).shape[0])
    t = 0
    while f"transformer.resblocks.{t}.ln_1.weight" in sd:
        t += 1
    return dict(
        embed_dim=embed_dim,
        vision_layers=tuple(n_blocks(i) for i in (1, 2, 3, 4)),
        vision_width=width,
        image_resolution=spatial * 32,
        context_length=int(_np(sd["positional_embedding"]).shape[0]),
        vocab_size=int(_np(sd["token_embedding.weight"]).shape[0]),
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=t,
    )


def convert_clip_resnet(sd: Dict, cfg) -> Dict:
    """OpenAI CLIP-RN state dict -> flax variables for
    models.clip_resnet.CLIPResNetModel (params + batch_stats)."""
    visual: Dict[str, Any] = {}
    vstats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        visual[f"conv{i}"] = _conv(sd, f"visual.conv{i}")
        visual[f"bn{i}"], vstats[f"bn{i}"] = _bn(sd, f"visual.bn{i}")
    for layer_i, n in zip((1, 2, 3, 4), cfg.vision_layers):
        for b in range(n):
            name = f"layer{layer_i}_{b}"
            visual[name], vstats[name] = _bottleneck(
                sd, f"visual.layer{layer_i}.{b}")
    visual["attnpool"] = {
        "positional_embedding":
            _np(sd["visual.attnpool.positional_embedding"]),
        "q_proj": _dense(sd, "visual.attnpool.q_proj"),
        "k_proj": _dense(sd, "visual.attnpool.k_proj"),
        "v_proj": _dense(sd, "visual.attnpool.v_proj"),
        "c_proj": _dense(sd, "visual.attnpool.c_proj"),
    }

    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
        "transformer": {},
    }
    for i in range(cfg.text_layers):
        text["transformer"][f"resblock_{i}"] = _resblock(
            sd, f"transformer.resblocks.{i}")

    return {
        "params": {
            "visual": visual,
            "text": text,
            "logit_scale": _np(sd["logit_scale"]),
        },
        "batch_stats": {"visual": vstats},
    }


# --------------------------------------------------------------------------
# MultiFusion Combiner (combiner_arithmetic.pt layout,
# MultiFusion/src/combiner.py:81-180)
# --------------------------------------------------------------------------

def combiner_config_from_sd(sd: Dict) -> Dict[str, Any]:
    return dict(
        clip_feature_dim=int(_np(sd["output_layer.weight"]).shape[0]),
        projection_dim=int(_np(sd["text_projection_layer.weight"]).shape[0]),
        hidden_dim=int(_np(sd["combiner_layer.weight"]).shape[0]),
        middle_mix="conv4x4",
    )


# --------------------------------------------------------------------------
# YOLOv5 (ultralytics .pt layout — the pretrained detector the reference
# explainability pipeline shells out to, MCT/yolov5/detect.py:114-233)
# --------------------------------------------------------------------------

# sequential module index (yolov5 P5 yaml order) -> flax module name in
# models.yolo.YoloV5
_YOLO_IDX2NAME = {
    0: "stem", 1: "down1", 2: "c3_1", 3: "down2", 4: "c3_2", 5: "down3",
    6: "c3_3", 7: "down4", 8: "c3_4", 9: "sppf", 10: "up5_conv", 13: "n4",
    14: "up4_conv", 17: "n3", 18: "pan3", 20: "n4b", 21: "pan4", 23: "n5b",
}


def _yolo_cbs(sd: Dict, prefix: str):
    """ultralytics Conv (conv+bn+SiLU) -> ConvBnSiLU params/stats."""
    params = {"conv": _conv(sd, f"{prefix}.conv")}
    params["bn"], stats = _bn(sd, f"{prefix}.bn")
    return params, {"bn": stats}


def _yolo_c3(sd: Dict, prefix: str):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for cv in ("cv1", "cv2", "cv3"):
        params[cv], stats[cv] = _yolo_cbs(sd, f"{prefix}.{cv}")
    j = 0
    while f"{prefix}.m.{j}.cv1.conv.weight" in sd:
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        bp["cv1"], bs["cv1"] = _yolo_cbs(sd, f"{prefix}.m.{j}.cv1")
        bp["cv2"], bs["cv2"] = _yolo_cbs(sd, f"{prefix}.m.{j}.cv2")
        params[f"m{j}"] = bp
        stats[f"m{j}"] = bs
        j += 1
    return params, stats


def yolo_config_from_torch(model_or_sd):
    """(DetectionModel | state dict) -> (YoloConfig, flat state dict).
    nc / multiples / anchors are derived from shapes (and the model's yaml
    when available); anchors are rescaled from grid units back to pixels."""
    from ..models.yolo import YoloConfig
    if hasattr(model_or_sd, "state_dict"):
        m = model_or_sd.float()
        sd = dict(m.state_dict())
        yaml = dict(getattr(m, "yaml", {}) or {})
    else:
        sd = dict(model_or_sd)
        yaml = {}
    det = max(int(k.split(".")[1]) for k in sd
              if k.startswith("model.") and k.endswith(".anchors"))
    no = int(_np(sd[f"model.{det}.m.0.weight"]).shape[0])
    # Segment checkpoints (yolov5*-seg.pt) carry a proto submodule on
    # the head; nm/npr come from its conv shapes (models/yolo.py:92-99)
    nm = npr = 0
    if f"model.{det}.proto.cv3.conv.weight" in sd:
        nm = int(_np(sd[f"model.{det}.proto.cv3.conv.weight"]).shape[0])
        npr = int(_np(sd[f"model.{det}.proto.cv1.conv.weight"]).shape[0])
    nc = yaml.get("nc", no // 3 - 5 - nm)
    wm = float(yaml.get("width_multiple",
                        _np(sd["model.0.conv.weight"]).shape[0] / 64.0))
    n2 = 0
    while f"model.2.m.{n2}.cv1.conv.weight" in sd:
        n2 += 1
    dm = float(yaml.get("depth_multiple", n2 / 3.0))
    anch = _np(sd[f"model.{det}.anchors"]).astype(np.float64)   # (3, 3, 2)
    anchors = tuple(
        tuple(tuple(float(v) for v in a) for a in anch[i] * s)
        for i, s in enumerate((8, 16, 32)))
    cfg = YoloConfig(num_classes=int(nc), depth_multiple=dm,
                     width_multiple=wm, anchors=anchors,
                     masks=nm, protos=npr)
    return cfg, sd


def convert_yolov5(sd: Dict, cfg) -> Dict:
    """ultralytics yolov5 state dict -> flax variables for
    models.yolo.YoloV5 (params + batch_stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for idx, name in _YOLO_IDX2NAME.items():
        prefix = f"model.{idx}"
        if f"{prefix}.conv.weight" in sd:           # plain Conv
            params[name], stats[name] = _yolo_cbs(sd, prefix)
        elif f"{prefix}.cv3.conv.weight" in sd:     # C3
            params[name], stats[name] = _yolo_c3(sd, prefix)
        else:                                       # SPPF
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["cv1"], s["cv1"] = _yolo_cbs(sd, f"{prefix}.cv1")
            p["cv2"], s["cv2"] = _yolo_cbs(sd, f"{prefix}.cv2")
            params[name], stats[name] = p, s
    det = max(int(k.split(".")[1]) for k in sd
              if k.startswith("model.") and k.endswith(".anchors"))
    for i in range(3):
        w = _np(sd[f"model.{det}.m.{i}.weight"])     # (no, C, 1, 1)
        params[f"detect_{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": _np(sd[f"model.{det}.m.{i}.bias"]),
        }
    if f"model.{det}.proto.cv1.conv.weight" in sd:   # Segment variant
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for cv in ("cv1", "cv2", "cv3"):
            p[cv], s[cv] = _yolo_cbs(sd, f"model.{det}.proto.{cv}")
        params["proto"], stats["proto"] = p, s
    return {"params": params, "batch_stats": stats}


# index -> flax name for the ClassificationModel trunk (cutoff=10 keeps
# model.0..9 and replaces the SPPF slot, index 9, with Classify —
# MCT/yolov5/models/yolo.py:279-292)
_YOLO_CLS_IDX2NAME = {
    0: "stem", 1: "down1", 2: "c3_1", 3: "down2", 4: "c3_2", 5: "down3",
    6: "c3_3", 7: "down4", 8: "c3_4",
}


def yolo_cls_config_from_torch(model_or_sd):
    """(ClassificationModel | state dict) -> (YoloConfig, state dict)
    for models.yolo.YoloClassifier."""
    from ..models.yolo import YoloConfig
    if hasattr(model_or_sd, "state_dict"):
        sd = dict(model_or_sd.float().state_dict())
    else:
        sd = dict(model_or_sd)
    nc = int(_np(sd["model.9.linear.weight"]).shape[0])
    wm = float(_np(sd["model.0.conv.weight"]).shape[0] / 64.0)
    n2 = 0
    while f"model.2.m.{n2}.cv1.conv.weight" in sd:
        n2 += 1
    return YoloConfig(num_classes=nc, depth_multiple=n2 / 3.0,
                      width_multiple=wm), sd


def convert_yolov5_cls(sd: Dict, cfg) -> Dict:
    """yolov5-cls ClassificationModel state dict -> flax variables for
    models.yolo.YoloClassifier (Classify head at model.9:
    conv(+bn) -> pool -> linear, common.py :847-860)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for idx, name in _YOLO_CLS_IDX2NAME.items():
        prefix = f"model.{idx}"
        if f"{prefix}.conv.weight" in sd:
            params[name], stats[name] = _yolo_cbs(sd, prefix)
        else:
            params[name], stats[name] = _yolo_c3(sd, prefix)
    params["classify_conv"], stats["classify_conv"] = _yolo_cbs(
        sd, "model.9.conv")
    params["classify_linear"] = {
        "kernel": _np(sd["model.9.linear.weight"]).T,
        "bias": _np(sd["model.9.linear.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def convert_combiner(sd: Dict) -> Dict:
    """Reference Combiner state dict -> flax variables for
    models.combiner.Combiner with middle_mix='conv4x4' (the checkpoint
    contract — see CombinerConfig.middle_mix)."""
    w = _np(sd["m_remained.weight"])                  # (C, C, 1, 1)
    params: Dict[str, Any] = {
        "text_projection_layer": _dense(sd, "text_projection_layer"),
        "image_projection_layer": _dense(sd, "image_projection_layer"),
        "combiner_layer": _dense(sd, "combiner_layer"),
        "output_layer": _dense(sd, "output_layer"),
        "dynamic_scalar_fc1": _dense(sd, "dynamic_scalar.0"),
        "dynamic_scalar_fc2": _dense(sd, "dynamic_scalar.3"),
        "m_remained_kernel": w[:, :, 0, 0].T,          # (C_in, C_out)
        "m_remained_bias": _np(sd["m_remained.bias"]),
        "m_residual": _dense(sd, "m_residual"),
        "self_attn_1": {
            "ln_1": _ln(sd, "self_attn_1.ln_1"),
            "ln_2": _ln(sd, "self_attn_1.ln_2"),
            "attn": _mha_from_inproj(sd, "self_attn_1.attn"),
            "c_fc": _dense(sd, "self_attn_1.mlp.c_fc"),
            "c_proj": _dense(sd, "self_attn_1.mlp.c_proj"),
        },
    }
    return {"params": params}


def _conv3d(w) -> Dict:
    """torch Conv3d weight (out, in, t, h, w) -> flax (t, h, w, in, out)."""
    return {"kernel": _np(w).transpose(2, 3, 4, 1, 0)}


# mmaction ConvModule bn uses the same key grammar as torch BatchNorm
_bn3d = _bn


def convert_resnet3d(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                     cls_head_key: Optional[str] = "cls_head.fc_cls"
                     ) -> Dict:
    """mmaction ResNet3d / ResNet3dSlowOnly checkpoint -> flax variables
    for models.resnet3d.ResNet3D (optionally wrapped in
    BackboneClassifier when the checkpoint carries a cls_head).

    Key map (mmaction resnet3d.py ConvModule naming):
      backbone.conv1.conv/bn             -> conv1 / bn1
      backbone.layer{s}.{j}.conv{k}.conv -> layer{s}_{j}/conv{k}
      backbone.layer{s}.{j}.conv{k}.bn   -> layer{s}_{j}/bn{k}
      ...downsample.conv / downsample.bn -> downsample / bn_down
      cls_head.fc_cls                    -> cls_head/fc_cls
    """
    p = backbone_prefix
    params: Dict = {"conv1": _conv3d(sd[p + "conv1.conv.weight"])}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn3d(sd, p + "conv1.bn")
    for s, blocks in enumerate(cfg.stage_blocks, start=1):
        for j in range(blocks):
            src = f"{p}layer{s}.{j}."
            dst = f"layer{s}_{j}"
            blk: Dict = {}
            blk_stats: Dict = {}
            for k in (1, 2, 3):
                blk[f"conv{k}"] = _conv3d(sd[src + f"conv{k}.conv.weight"])
                blk[f"bn{k}"], blk_stats[f"bn{k}"] = _bn3d(
                    sd, src + f"conv{k}.bn")
            if src + "downsample.conv.weight" in sd:
                blk["downsample"] = _conv3d(
                    sd[src + "downsample.conv.weight"])
                blk["bn_down"], blk_stats["bn_down"] = _bn3d(
                    sd, src + "downsample.bn")
            params[dst] = blk
            stats[dst] = blk_stats
            # the *_nl configs insert NonLocal3d after flagged blocks
            # (resnet3d.py:131-133) — dropping its weights silently
            # would import a numerically different backbone
            if any(k.startswith(src + "non_local_block.") for k in sd):
                nl_p, nl_s = _non_local3d(sd, src + "non_local_block.")
                params[dst + "_nl"] = nl_p
                stats[dst + "_nl"] = nl_s
    variables = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        w = _np(sd[cls_head_key + ".weight"])
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": {"kernel": w.T,
                                               "bias": _np(
                                                   sd[cls_head_key
                                                      + ".bias"])}}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def _non_local3d(sd: Dict, p: str) -> Tuple[Dict, Dict]:
    """mmcv NonLocal3d -> models.resnet3d.NonLocal3DBlock params.

    sub_sample=True wraps g/phi in nn.Sequential(conv, maxpool), so
    their ConvModule keys gain a '.0' (g.0.conv.weight); theta and
    conv_out are plain.  conv_out is bias-free with a BN."""
    def conv(name):
        base = p + name
        if base + ".0.conv.weight" in sd:
            base = base + ".0"
        return {"kernel": _np(sd[base + ".conv.weight"])
                .transpose(2, 3, 4, 1, 0),
                "bias": _np(sd[base + ".conv.bias"])}

    params = {"g": conv("g"), "theta": conv("theta"), "phi": conv("phi"),
              "conv_out": _conv3d(sd[p + "conv_out.conv.weight"])}
    bn, bn_stats = _bn3d(sd, p + "conv_out.bn")
    params["bn_out"] = bn
    return params, {"bn_out": bn_stats}


def _convert_bottlenecks(sd: Dict, src_prefix: str, stage_blocks,
                         dst_fmt: str) -> Tuple[Dict, Dict]:
    """Shared mmaction ConvModule block mapping for the resnet3d family."""
    params: Dict = {}
    stats: Dict = {}
    for s, blocks in enumerate(stage_blocks, start=1):
        for j in range(blocks):
            src = f"{src_prefix}layer{s}.{j}."
            dst = dst_fmt.format(s=s, j=j)
            blk: Dict = {}
            blk_stats: Dict = {}
            for k in (1, 2, 3):
                blk[f"conv{k}"] = _conv3d(sd[src + f"conv{k}.conv.weight"])
                blk[f"bn{k}"], blk_stats[f"bn{k}"] = _bn3d(
                    sd, src + f"conv{k}.bn")
            if src + "downsample.conv.weight" in sd:
                blk["downsample"] = _conv3d(
                    sd[src + "downsample.conv.weight"])
                blk["bn_down"], blk_stats["bn_down"] = _bn3d(
                    sd, src + "downsample.bn")
            params[dst] = blk
            stats[dst] = blk_stats
    return params, stats


def convert_slowfast(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                     cls_head_key: Optional[str] = "cls_head.fc_cls"
                     ) -> Dict:
    """mmaction SlowFast checkpoint -> flax variables for
    models.resnet3d.SlowFast (resnet3d_slowfast.py key grammar:
    backbone.{slow,fast}_path.* pathways, conv1_lateral +
    layer{1..3}_lateral fusion convs; head concat order (slow, fast)
    matches slowfast_head.py:70)."""
    p = backbone_prefix

    # fast pathway == a plain ResNet3D under submodule 'fast'
    from ..models.resnet3d import ResNet3DConfig
    fast_cfg = ResNet3DConfig(
        stage_blocks=cfg.depth_blocks, base_channels=cfg.base_channels,
        conv1_kernel_t=5, stage_temporal_kernels=(3, 3, 3, 3),
        channel_ratio=cfg.beta_inv)
    fast = convert_resnet3d(sd, fast_cfg,
                            backbone_prefix=p + "fast_path.",
                            cls_head_key=None)
    params: Dict = {"fast": fast["params"]}
    stats: Dict = {"fast": fast["batch_stats"]}

    params["slow_conv1"] = _conv3d(sd[p + "slow_path.conv1.conv.weight"])
    params["slow_bn1"], stats["slow_bn1"] = _bn3d(
        sd, p + "slow_path.conv1.bn")
    lateral_srcs = ["slow_path.conv1_lateral"] + [
        f"slow_path.layer{i}_lateral" for i in (1, 2, 3)]
    has_lateral_bn = p + lateral_srcs[0] + ".bn.weight" in sd
    if has_lateral_bn != cfg.lateral_norm:
        raise ValueError(
            f"checkpoint lateral BN={has_lateral_bn} but "
            f"SlowFastConfig.lateral_norm={cfg.lateral_norm} — "
            f"importing would silently {'drop the lateral BN+ReLU' if has_lateral_bn else 'add an untrained BN'}")
    for i, src in enumerate(lateral_srcs):
        params[f"lateral_{i}"] = _conv3d(sd[p + src + ".conv.weight"])
        if has_lateral_bn:
            params[f"lateral_bn_{i}"], stats[f"lateral_bn_{i}"] = _bn3d(
                sd, p + src + ".bn")
    slow_params, slow_stats = _convert_bottlenecks(
        sd, p + "slow_path.", cfg.depth_blocks, "slow_l{s}_{j}")
    params.update(slow_params)
    stats.update(slow_stats)

    variables = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        w = _np(sd[cls_head_key + ".weight"])
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": {
                           "kernel": w.T,
                           "bias": _np(sd[cls_head_key + ".bias"])}}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def convert_videomae(sd: Dict, prefix: str = "",
                     head_key: Optional[str] = "head") -> Dict:
    """VideoMAE finetuned ViT checkpoint -> flax variables for
    models.videomae_vit.VideoMAEViT (reference
    MCT/mmaction/models/backbones/videomae.py key grammar:
    patch_embed.proj, blocks.{i}.{norm1,attn.{qkv,q_bias,v_bias,proj},
    norm2,mlp.{fc1,fc2},gamma_1,gamma_2}, fc_norm; the sinusoid
    pos_embed is recomputed, not loaded).  mmaction-layout checkpoints
    (keys under `backbone.`) are auto-detected."""
    p = prefix
    if (p + "patch_embed.proj.weight" not in sd
            and "backbone.patch_embed.proj.weight" in sd):
        p = "backbone."
    params: Dict = {
        "patch_embed": {
            "kernel": _np(sd[p + "patch_embed.proj.weight"])
            .transpose(2, 3, 4, 1, 0),
            "bias": _np(sd[p + "patch_embed.proj.bias"]),
        },
        "fc_norm": {"scale": _np(sd[p + "fc_norm.weight"]),
                    "bias": _np(sd[p + "fc_norm.bias"])},
    }
    i = 0
    while p + f"blocks.{i}.attn.qkv.weight" in sd:
        bp = p + f"blocks.{i}."
        blk = {
            "norm1": {"scale": _np(sd[bp + "norm1.weight"]),
                      "bias": _np(sd[bp + "norm1.bias"])},
            "norm2": {"scale": _np(sd[bp + "norm2.weight"]),
                      "bias": _np(sd[bp + "norm2.bias"])},
            "attn": {
                "qkv_weight": _np(sd[bp + "attn.qkv.weight"]).T,
                "q_bias": _np(sd[bp + "attn.q_bias"]),
                "v_bias": _np(sd[bp + "attn.v_bias"]),
                "proj": _dense(sd, bp + "attn.proj"),
            },
            "fc1": _dense(sd, bp + "mlp.fc1"),
            "fc2": _dense(sd, bp + "mlp.fc2"),
        }
        if bp + "gamma_1" in sd:
            blk["gamma_1"] = _np(sd[bp + "gamma_1"])
            blk["gamma_2"] = _np(sd[bp + "gamma_2"])
        params[f"block_{i}"] = blk
        i += 1
    variables = {"params": params}
    # finetuned classifier: original VideoMAE layout stores it at
    # `head` NEXT TO the backbone keys; mmaction-layout checkpoints
    # (backbone.* prefix) store it at top-level `cls_head.fc_cls` —
    # joining head_key onto the backbone prefix would miss it and
    # silently drop the trained classifier
    head = None
    if head_key and p + head_key + ".weight" in sd:
        head = _dense(sd, p + head_key)
    elif "cls_head.fc_cls.weight" in sd:
        head = _dense(sd, "cls_head.fc_cls")
    if head is not None:
        # nest {backbone, cls_head} like the other converters so
        # BackboneClassifier consumes it directly
        variables = {"params": {
            "backbone": params,
            "cls_head": {"fc_cls": head},
        }}
    return variables


def convert_x3d(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                cls_head_prefix: Optional[str] = "cls_head.") -> Dict:
    """mmaction X3D checkpoint -> flax variables for models.resnet3d.X3D
    (+ X3DClassifier when the two-layer head is present).

    Key map (x3d.py): conv1_s.conv (norm-free stem) -> stem_s;
    conv1_t.conv/bn (depthwise temporal) -> stem_t/stem_bn;
    layer{i}.{j}.conv{1,2,3}.conv/bn -> s{i}_{j}/conv{k}+bn{k};
    se_module.fc{1,2} (1x1x1 convs) -> se/fc{1,2} dense; downsample ->
    downsample/bn_down; conv5.conv/bn -> conv5/bn5; head fc1/fc2."""
    p = backbone_prefix
    params: Dict = {
        "stem_s": _conv3d(sd[p + "conv1_s.conv.weight"]),
        "stem_t": _conv3d(sd[p + "conv1_t.conv.weight"]),
        "conv5": _conv3d(sd[p + "conv5.conv.weight"]),
    }
    stats: Dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn3d(sd, p + "conv1_t.bn")
    params["bn5"], stats["bn5"] = _bn3d(sd, p + "conv5.bn")
    for i, blocks in enumerate(cfg.stage_blocks, start=1):
        for j in range(blocks):
            src = f"{p}layer{i}.{j}."
            dst = f"s{i}_{j}"
            blk: Dict = {}
            blk_stats: Dict = {}
            for k in (1, 2, 3):
                blk[f"conv{k}"] = _conv3d(sd[src + f"conv{k}.conv.weight"])
                blk[f"bn{k}"], blk_stats[f"bn{k}"] = _bn3d(
                    sd, src + f"conv{k}.bn")
            if src + "se_module.fc1.weight" in sd:
                blk["se"] = {
                    "fc1": {"kernel": _np(sd[src + "se_module.fc1.weight"]
                                          )[..., 0, 0, 0].T,
                            "bias": _np(sd[src + "se_module.fc1.bias"])},
                    "fc2": {"kernel": _np(sd[src + "se_module.fc2.weight"]
                                          )[..., 0, 0, 0].T,
                            "bias": _np(sd[src + "se_module.fc2.bias"])},
                }
            if src + "downsample.conv.weight" in sd:
                blk["downsample"] = _conv3d(
                    sd[src + "downsample.conv.weight"])
                blk["bn_down"], blk_stats["bn_down"] = _bn3d(
                    sd, src + "downsample.bn")
            params[dst] = blk
            stats[dst] = blk_stats
    variables = {"params": params, "batch_stats": stats}
    if cls_head_prefix and cls_head_prefix + "fc1.weight" in sd:
        # X3DHead builds fc1 with bias=False in every shipped mmaction
        # x3d config (x3d_head.py fc1_bias default False) — real
        # checkpoints have no fc1.bias key; a zero bias is equivalent
        w1 = _np(sd[cls_head_prefix + "fc1.weight"])
        fc1 = {"kernel": w1.T,
               "bias": (_np(sd[cls_head_prefix + "fc1.bias"])
                        if cls_head_prefix + "fc1.bias" in sd
                        else np.zeros(w1.shape[0], np.float32))}
        variables = {
            "params": {"backbone": params,
                       "cls_head": {
                           "fc1": fc1,
                           "fc2": _dense(sd, cls_head_prefix + "fc2")}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def convert_csn(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                cls_head_key: Optional[str] = "cls_head.fc_cls") -> Dict:
    """mmaction ResNet3dCSN checkpoint -> flax variables for
    models.resnet3d.CSN (+ BackboneClassifier head when present).

    Key map (resnet3d_csn.py: CSNBottleneck3d turns Bottleneck3d's conv2
    into nn.Sequential — conv2.0 is the ip pointwise (conv+bn) when
    present, the depthwise conv+bn is the last element):
      backbone.conv1.conv/bn                -> conv1/bn1
      layer{i}.{j}.conv1.conv/bn            -> conv1/bn1
      layer{i}.{j}.conv2.{0|1}.conv/bn      -> conv2_point/bn_point (ip),
                                               conv2_depth/bn2
      layer{i}.{j}.conv3.conv/bn            -> conv3/bn3
      layer{i}.{j}.downsample.conv/bn       -> conv_down/bn_down
    """
    p = backbone_prefix
    params: Dict = {"conv1": _conv3d(sd[p + "conv1.conv.weight"])}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn3d(sd, p + "conv1.bn")
    ip = any(".conv2.1.conv.weight" in k for k in sd)
    depth_idx = 1 if ip else 0
    for i, blocks in enumerate(cfg.stage_blocks, start=1):
        for j in range(blocks):
            src = f"{p}layer{i}.{j}."
            dst = f"layer{i}_{j}"
            blk: Dict = {"conv1": _conv3d(sd[src + "conv1.conv.weight"]),
                         "conv3": _conv3d(sd[src + "conv3.conv.weight"])}
            blk_stats: Dict = {}
            blk["bn1"], blk_stats["bn1"] = _bn3d(sd, src + "conv1.bn")
            blk["bn3"], blk_stats["bn3"] = _bn3d(sd, src + "conv3.bn")
            if ip:
                blk["conv2_point"] = _conv3d(
                    sd[src + "conv2.0.conv.weight"])
                blk["bn_point"], blk_stats["bn_point"] = _bn3d(
                    sd, src + "conv2.0.bn")
            blk["conv2_depth"] = _conv3d(
                sd[src + f"conv2.{depth_idx}.conv.weight"])
            blk["bn2"], blk_stats["bn2"] = _bn3d(
                sd, src + f"conv2.{depth_idx}.bn")
            if src + "downsample.conv.weight" in sd:
                blk["conv_down"] = _conv3d(
                    sd[src + "downsample.conv.weight"])
                blk["bn_down"], blk_stats["bn_down"] = _bn3d(
                    sd, src + "downsample.bn")
            params[dst] = blk
            stats[dst] = blk_stats
    variables = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        w = _np(sd[cls_head_key + ".weight"])
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": {
                           "kernel": w.T,
                           "bias": _np(sd[cls_head_key + ".bias"])}}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def _conv2d(w) -> Dict:
    """torch Conv2d weight (out, in, h, w) -> flax (h, w, in, out)."""
    return {"kernel": _np(w).transpose(2, 3, 1, 0)}


_bn_torch = _bn      # plain torch BatchNorm: identical key grammar


def convert_tsm(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                cls_head_key: Optional[str] = "cls_head.fc_cls") -> Dict:
    """mmaction ResNetTSM checkpoint -> flax variables for
    models.backbones2d.TSMResNet (+ Recognizer2D/TSNHead when the head is
    present).  TSM adds NO weights over the 2D ResNet-50 — the temporal
    shift is parameter-free (backbones/resnet_tsm.py) — and mmaction's 2D
    ResNet is ConvModule-based, so the key grammar is conv{k}.conv/bn,
    downsample.conv/bn.  The shift wrapper (conv1.conv = TemporalShift(
    net=conv)) nests the conv weight one level deeper: conv1.conv.net.

    Torchvision-layout checkpoints (conv1.weight / bn1 / downsample.0)
    are auto-detected and handled too."""
    if any(".non_local_block." in k for k in sd):
        raise ValueError(
            "TSM checkpoint carries non_local_block weights (a *_nl "
            "config); TSMResNet has no non-local support yet — refusing "
            "to import a numerically different backbone silently")
    p = backbone_prefix
    torchvision = p + "conv1.weight" in sd

    def stem():
        if torchvision:
            return _conv2d(sd[p + "conv1.weight"]), _bn_torch(sd, p + "bn1")
        return (_conv2d(sd[p + "conv1.conv.weight"]),
                _bn3d(sd, p + "conv1.bn"))

    def block_conv(src, k):
        if torchvision:
            return (_conv2d(sd[src + f"conv{k}.weight"]),
                    _bn_torch(sd, src + f"bn{k}"))
        # the TSM wrapper may nest conv1's weight under conv1.conv.net
        for key in (f"conv{k}.conv.weight", f"conv{k}.conv.net.weight"):
            if src + key in sd:
                return (_conv2d(sd[src + key]), _bn3d(sd, src + f"conv{k}.bn"))
        raise KeyError(src + f"conv{k}.conv.weight")

    def block_down(src):
        if torchvision:
            if src + "downsample.0.weight" not in sd:
                return None
            return (_conv2d(sd[src + "downsample.0.weight"]),
                    _bn_torch(sd, src + "downsample.1"))
        if src + "downsample.conv.weight" not in sd:
            return None
        return (_conv2d(sd[src + "downsample.conv.weight"]),
                _bn3d(sd, src + "downsample.bn"))

    params: Dict = {}
    stats: Dict = {}
    params["conv1"], (params["bn1"], stats["bn1"]) = stem()
    for i, blocks in enumerate(cfg.stage_blocks, start=1):
        for j in range(blocks):
            src = f"{p}layer{i}.{j}."
            dst = f"layer{i}_{j}"
            blk: Dict = {}
            blk_stats: Dict = {}
            for k in (1, 2, 3):
                blk[f"conv{k}"], (blk[f"bn{k}"], blk_stats[f"bn{k}"]) = \
                    block_conv(src, k)
            down = block_down(src)
            if down is not None:
                blk["downsample"], (blk["bn_down"],
                                    blk_stats["bn_down"]) = down
            params[dst] = blk
            stats[dst] = blk_stats
    variables = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        w = _np(sd[cls_head_key + ".weight"])
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": {
                           "kernel": w.T,
                           "bias": _np(sd[cls_head_key + ".bias"])}}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def _conv1d(sd: Dict, name: str) -> Dict:
    """torch Conv1d (out, in, k) -> flax Conv (k, in, out)."""
    return {"kernel": _np(sd[name + ".weight"]).transpose(2, 1, 0),
            "bias": _np(sd[name + ".bias"])}


def convert_tin(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                cls_head_key: Optional[str] = "cls_head.fc_cls") -> Dict:
    """mmaction ResNetTIN checkpoint -> flax variables for
    models.tin_mobilenet.TINResNetExact (+ Recognizer2D/TSNHead).

    ResNetTIN wraps each block's conv1.conv in CombineNet(net1=
    TemporalInterlace, net2=conv) (resnet_tin.py:344-358), so keys are
      layer{i}.{j}.conv1.conv.net1.offset_net.{conv,fc1,fc2}
      layer{i}.{j}.conv1.conv.net1.weight_net.conv
      layer{i}.{j}.conv1.conv.net2  (the 1x1 conv itself)
    over the ConvModule grammar of the 2D ResNet."""
    p = backbone_prefix
    params: Dict = {"conv1": _conv2d(sd[p + "conv1.conv.weight"])}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn3d(sd, p + "conv1.bn")
    for i, blocks in enumerate(cfg.stage_blocks, start=1):
        for j in range(blocks):
            src = f"{p}layer{i}.{j}."
            dst = f"layer{i}_{j}"
            net1 = src + "conv1.conv.net1."
            blk: Dict = {
                "interlace": {
                    "offset_net": {
                        "conv": _conv1d(sd, net1 + "offset_net.conv"),
                        "fc1": _dense(sd, net1 + "offset_net.fc1"),
                        "fc2": _dense(sd, net1 + "offset_net.fc2"),
                    },
                    "weight_net": {
                        "conv": _conv1d(sd, net1 + "weight_net.conv"),
                    },
                },
                "conv1": _conv2d(sd[src + "conv1.conv.net2.weight"]),
                "conv2": _conv2d(sd[src + "conv2.conv.weight"]),
                "conv3": _conv2d(sd[src + "conv3.conv.weight"]),
            }
            blk_stats: Dict = {}
            for k in (1, 2, 3):
                blk[f"bn{k}"], blk_stats[f"bn{k}"] = _bn3d(
                    sd, src + f"conv{k}.bn")
            if src + "downsample.conv.weight" in sd:
                blk["downsample"] = _conv2d(
                    sd[src + "downsample.conv.weight"])
                blk["bn_down"], blk_stats["bn_down"] = _bn3d(
                    sd, src + "downsample.bn")
            params[dst] = blk
            stats[dst] = blk_stats
    variables = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        w = _np(sd[cls_head_key + ".weight"])
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": {
                           "kernel": w.T,
                           "bias": _np(sd[cls_head_key + ".bias"])}}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def convert_c3d(sd: Dict, backbone_prefix: str = "backbone.",
                cls_head_key: Optional[str] = "cls_head.fc_cls") -> Dict:
    """mmaction C3D checkpoint -> flax variables for
    models.backbones2d.C3D(exact_head=True) (+ Recognizer head).

    Key map (mmaction backbones/c3d.py:64-106, ConvModule with
    norm_cfg=None so convs carry biases and there are no BNs):
      backbone.conv{k}.conv -> conv{k};  backbone.fc6/fc7 -> fc6/fc7.
    fc6 consumes torch's channel-first flatten of the (512, 1, 4, 4)
    pool5 map; the kernel rows are permuted to the model's
    (C, T, H, W)-flattened order (which matches torch's, since the
    model transposes to channel-first before flattening)."""
    p = backbone_prefix
    params: Dict = {}
    for name in ("conv1a", "conv2a", "conv3a", "conv3b", "conv4a",
                 "conv4b", "conv5a", "conv5b"):
        params[name] = {
            "kernel": _np(sd[p + name + ".conv.weight"]).transpose(
                2, 3, 4, 1, 0),
            "bias": _np(sd[p + name + ".conv.bias"]),
        }
    params["fc6"] = _dense(sd, p.rstrip(".") + ".fc6")
    params["fc7"] = _dense(sd, p.rstrip(".") + ".fc7")
    variables: Dict = {"params": params}
    if cls_head_key and cls_head_key + ".weight" in sd:
        variables = {"params": {
            "backbone": params,
            "cls_head": {"fc_cls": _dense(sd, cls_head_key)}}}
    return variables


def _conv2plus1d(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """mmaction Conv2plus1d (conv_s + bn_s + conv_t) -> the flax
    Conv2Plus1D module's (params, batch_stats)."""
    bn_p, bn_s = _bn3d(sd, prefix + ".bn_s")
    return ({"conv_s": _conv3d(sd[prefix + ".conv_s.weight"]),
             "bn_s": bn_p,
             "conv_t": _conv3d(sd[prefix + ".conv_t.weight"])},
            {"bn_s": bn_s})


def convert_r2plus1d(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                     cls_head_key: Optional[str] = "cls_head.fc_cls"
                     ) -> Dict:
    """mmaction ResNet2Plus1d checkpoint -> flax variables for
    models.backbones2d.R2Plus1D (+ I3DHead when present).

    Key map (resnet2plus1d.py over resnet3d.py BasicBlock3d with
    conv_cfg=Conv2plus1d; every conv — stem, block convs AND the 1x1x1
    downsamples — is a factorized conv_s/bn_s/conv_t triplet):
      backbone.conv1.conv.{conv_s,bn_s,conv_t} + conv1.bn -> conv1/bn1
      backbone.layer{s}.{j}.conv{k}.conv.*     + conv{k}.bn
                                    -> layer{s}_{j}/conv{k} + bn{k}
      backbone.layer{s}.{j}.downsample.conv.*  + downsample.bn
                                    -> downsample + bn_down
    """
    p = backbone_prefix
    params: Dict = {}
    stats: Dict = {}
    params["conv1"], stats["conv1"] = _conv2plus1d(sd, p + "conv1.conv")
    params["bn1"], stats["bn1"] = _bn3d(sd, p + "conv1.bn")
    for s, blocks in enumerate(cfg.stage_blocks, start=1):
        for j in range(blocks):
            src = f"{p}layer{s}.{j}."
            dst = f"layer{s}_{j}"
            blk: Dict = {}
            blk_stats: Dict = {}
            for k in (1, 2):
                blk[f"conv{k}"], cs = _conv2plus1d(
                    sd, src + f"conv{k}.conv")
                blk_stats[f"conv{k}"] = cs
                blk[f"bn{k}"], blk_stats[f"bn{k}"] = _bn3d(
                    sd, src + f"conv{k}.bn")
            if src + "downsample.conv.conv_s.weight" in sd:
                blk["downsample"], ds = _conv2plus1d(
                    sd, src + "downsample.conv")
                blk_stats["downsample"] = ds
                blk["bn_down"], blk_stats["bn_down"] = _bn3d(
                    sd, src + "downsample.bn")
            params[dst] = blk
            stats[dst] = blk_stats
    variables = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": _dense(sd, cls_head_key)}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def convert_mobilenetv2_tsm(sd: Dict, cfg,
                            backbone_prefix: str = "backbone.",
                            cls_head_key: Optional[str] = "cls_head.fc_cls"
                            ) -> Dict:
    """mmaction MobileNetV2TSM checkpoint -> flax variables for
    models.tin_mobilenet.MobileNetV2TSM (+ TSNHead).

    Key map (backbones/mobilenet_v2.py:37-121 + mobilenet_v2_tsm.py's
    TemporalShift wrapping of conv[0] on residual blocks):
      backbone.conv1.conv/bn               -> stem / bn_stem
      backbone.layer{i}.{j}.conv.{k}.conv  -> s{i-1}_b{j}/{expand,dw,
                                              project} (+ bn1/bn2/bn3);
        the first ConvModule may sit under conv.0.net.* when TSM-wrapped,
        and expand_ratio=1 blocks have no expand ConvModule at all
      backbone.conv2.conv/bn               -> head / bn_head
    """
    p = backbone_prefix
    params: Dict = {"stem": _conv2d(sd[p + "conv1.conv.weight"])}
    stats: Dict = {}
    bn, st = _bn3d(sd, p + "conv1.bn")
    params["bn_stem"], stats["bn_stem"] = bn, st

    def conv_module(prefix):
        """ConvModule possibly behind a TemporalShift 'net' wrapper."""
        for mid in ("", "net."):
            if prefix + mid + "conv.weight" in sd:
                w = _conv2d(sd[prefix + mid + "conv.weight"])
                b, s = _bn3d(sd, prefix + mid + "bn")
                return w, b, s
        raise KeyError(prefix + "conv.weight")

    for si, (e, c, n, s) in enumerate(cfg.stages):
        for j in range(n):
            src = f"{p}layer{si + 1}.{j}.conv."
            dst = f"s{si}_b{j}"
            blk: Dict = {}
            blk_stats: Dict = {}
            k = 0
            if e != 1:
                blk["expand"], blk["bn1"], blk_stats["bn1"] = conv_module(
                    src + f"{k}.")
                k += 1
            blk["dw"], blk["bn2"], blk_stats["bn2"] = conv_module(
                src + f"{k}.")
            k += 1
            # project ConvModule (no activation)
            blk["project"] = _conv2d(sd[src + f"{k}.conv.weight"])
            blk["bn3"], blk_stats["bn3"] = _bn3d(sd, src + f"{k}.bn")
            params[dst] = blk
            stats[dst] = blk_stats
    params["head"] = _conv2d(sd[p + "conv2.conv.weight"])
    params["bn_head"], stats["bn_head"] = _bn3d(sd, p + "conv2.bn")
    variables = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": _dense(sd, cls_head_key)}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def convert_stgcn(sd: Dict, channels=None, temporal_strides=None,
                  backbone_prefix: str = "backbone.",
                  cls_head_key: Optional[str] = "cls_head.fc") -> Tuple:
    """mmaction STGCN checkpoint -> (flax variables, STGCNConfig) for
    models.stgcn.STGCN (+ BackboneClassifier head when cls_head.fc is
    present).

    Key map (backbones/stgcn.py:23-280 + skeleton_gcn SkeletonGCN):
      backbone.data_bn (BatchNorm1d over V*C)   -> data_bn
      backbone.A (graph buffer, (K, V, V))      -> cfg.adjacency
                                                   (axes 1/2 swapped to
                                                   our A[k, tgt, src])
      backbone.st_gcn_networks.{i}.gcn.conv     -> block_{i}/gcn
      ...tcn.0 / tcn.2 / tcn.3                  -> bn_gcn / tcn / bn_tcn
      ...residual.0 / residual.1                -> residual / bn_res
      backbone.edge_importance.{i}              -> block_{i}/
                                                   edge_importance
      cls_head.fc (1x1 Conv2d)                  -> cls_head/fc_cls
    """
    from ..models.stgcn import STGCNConfig
    p = backbone_prefix
    A = _np(sd[p + "A"])
    K, V, _ = A.shape
    A_ours = np.swapaxes(A, 1, 2)
    adjacency = tuple(tuple(tuple(float(v) for v in row) for row in sub)
                      for sub in A_ours)

    n_blocks = 0
    while f"{p}st_gcn_networks.{n_blocks}.gcn.conv.weight" in sd:
        n_blocks += 1
    if channels is None:
        channels = tuple(
            _np(sd[f"{p}st_gcn_networks.{i}.tcn.2.weight"]).shape[0]
            for i in range(n_blocks))
    if temporal_strides is None:
        # stride-2 blocks carry a conv residual whose weight strides;
        # infer from the reference ladder: stride 2 wherever channels
        # jump, 1 elsewhere (stgcn.py:216-227)
        temporal_strides = tuple(
            2 if i > 0 and channels[i] != channels[i - 1] else 1
            for i in range(n_blocks))
    in_channels = _np(sd[p + "st_gcn_networks.0.gcn.conv.weight"]).shape[1]
    cfg = STGCNConfig(num_joints=V, in_channels=in_channels,
                      channels=tuple(channels),
                      temporal_strides=tuple(temporal_strides),
                      adjacency=adjacency)

    params: Dict = {}
    stats: Dict = {}
    dbn_p, dbn_s = _bn3d(sd, p + "data_bn")
    params["data_bn"], stats["data_bn"] = dbn_p, dbn_s
    for i in range(n_blocks):
        src = f"{p}st_gcn_networks.{i}."
        w = _np(sd[src + "gcn.conv.weight"])       # (K*out, in, 1, 1)
        blk: Dict = {
            "gcn": {"kernel": w[:, :, 0, 0].T,
                    "bias": _np(sd[src + "gcn.conv.bias"])},
            "tcn": {"kernel": _np(sd[src + "tcn.2.weight"]).transpose(
                        2, 3, 1, 0),
                    "bias": _np(sd[src + "tcn.2.bias"])},
            "edge_importance": _np(sd[p + f"edge_importance.{i}"]),
        }
        blk_stats: Dict = {}
        blk["bn_gcn"], blk_stats["bn_gcn"] = _bn3d(sd, src + "tcn.0")
        blk["bn_tcn"], blk_stats["bn_tcn"] = _bn3d(sd, src + "tcn.3")
        if src + "residual.0.weight" in sd:
            blk["residual"] = {
                "kernel": _np(sd[src + "residual.0.weight"]).transpose(
                    2, 3, 1, 0),
                "bias": _np(sd[src + "residual.0.bias"])}
            blk["bn_res"], blk_stats["bn_res"] = _bn3d(
                sd, src + "residual.1")
        params[f"block_{i}"] = blk
        stats[f"block_{i}"] = blk_stats
    variables: Dict = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        w = _np(sd[cls_head_key + ".weight"])      # (cls, C, 1, 1)
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": {
                           "kernel": w[:, :, 0, 0].T,
                           "bias": _np(sd[cls_head_key + ".bias"])}}},
            "batch_stats": {"backbone": stats},
        }
    return variables, cfg


def convert_agcn(sd: Dict, channels=None, temporal_strides=None,
                 backbone_prefix: str = "backbone.",
                 cls_head_key: Optional[str] = "cls_head.fc") -> Tuple:
    """mmaction AGCN (2s-AGCN) checkpoint -> (flax variables,
    AGCNConfig) for models.stgcn.AGCN.

    Key map (backbones/agcn.py:42-331):
      backbone.data_bn / backbone.A (buffer)    -> data_bn /
                                                   cfg.adjacency (as-is:
                                                   the block einsum uses
                                                   the reference
                                                   orientation)
      backbone.agcn_networks.{i}.gcn.PA         -> block_{i}/PA
      ...gcn.conv_{a,b,d}.{k}                   -> conv_{a,b,d}{k}
      ...gcn.down.0 / down.1                    -> down / bn_down
      ...gcn.bn                                 -> bn_gcn
      ...tcn.0 / tcn.1                          -> tcn / bn_tcn
      ...residual.0 / residual.1                -> residual / bn_res
      cls_head.fc (1x1 Conv2d)                  -> cls_head/fc_cls
    """
    from ..models.stgcn import AGCNConfig
    p = backbone_prefix
    A = _np(sd[p + "A"])
    K, V, _ = A.shape
    adjacency = tuple(tuple(tuple(float(v) for v in row) for row in sub)
                      for sub in A)

    n_blocks = 0
    while f"{p}agcn_networks.{n_blocks}.gcn.PA" in sd:
        n_blocks += 1
    if channels is None:
        channels = tuple(
            _np(sd[f"{p}agcn_networks.{i}.tcn.0.weight"]).shape[0]
            for i in range(n_blocks))
    if temporal_strides is None:
        temporal_strides = tuple(
            2 if i > 0 and channels[i] != channels[i - 1] else 1
            for i in range(n_blocks))
    in_channels = _np(
        sd[p + "agcn_networks.0.gcn.conv_d.0.weight"]).shape[1]
    cfg = AGCNConfig(num_joints=V, in_channels=in_channels,
                     channels=tuple(channels),
                     temporal_strides=tuple(temporal_strides),
                     adjacency=adjacency)

    def conv1x1(prefix):
        w = _np(sd[prefix + ".weight"])            # (out, in, 1, 1)
        return {"kernel": w[:, :, 0, 0].T,
                "bias": _np(sd[prefix + ".bias"])}

    params: Dict = {}
    stats: Dict = {}
    params["data_bn"], stats["data_bn"] = _bn3d(sd, p + "data_bn")
    for i in range(n_blocks):
        src = f"{p}agcn_networks.{i}."
        blk: Dict = {"PA": _np(sd[src + "gcn.PA"])}
        blk_stats: Dict = {}
        for k in range(K):
            blk[f"conv_a{k}"] = conv1x1(src + f"gcn.conv_a.{k}")
            blk[f"conv_b{k}"] = conv1x1(src + f"gcn.conv_b.{k}")
            blk[f"conv_d{k}"] = conv1x1(src + f"gcn.conv_d.{k}")
        blk["bn_gcn"], blk_stats["bn_gcn"] = _bn3d(sd, src + "gcn.bn")
        if src + "gcn.down.0.weight" in sd:
            blk["down"] = conv1x1(src + "gcn.down.0")
            blk["bn_down"], blk_stats["bn_down"] = _bn3d(
                sd, src + "gcn.down.1")
        blk["tcn"] = {
            "kernel": _np(sd[src + "tcn.0.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[src + "tcn.0.bias"])}
        blk["bn_tcn"], blk_stats["bn_tcn"] = _bn3d(sd, src + "tcn.1")
        if src + "residual.0.weight" in sd:
            blk["residual"] = {
                "kernel": _np(sd[src + "residual.0.weight"]).transpose(
                    2, 3, 1, 0),
                "bias": _np(sd[src + "residual.0.bias"])}
            blk["bn_res"], blk_stats["bn_res"] = _bn3d(
                sd, src + "residual.1")
        params[f"block_{i}"] = blk
        stats[f"block_{i}"] = blk_stats
    variables: Dict = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        w = _np(sd[cls_head_key + ".weight"])
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": {
                           "kernel": w[:, :, 0, 0].T,
                           "bias": _np(sd[cls_head_key + ".bias"])}}},
            "batch_stats": {"backbone": stats},
        }
    return variables, cfg


def convert_tanet(sd: Dict, cfg, backbone_prefix: str = "backbone.",
                  cls_head_key: Optional[str] = "cls_head.fc_cls") -> Dict:
    """mmaction TANet checkpoint -> flax variables for
    models.tanet.TANet (+ Recognizer2D/TSNHead).

    Key map (backbones/tanet.py TABlock wrapping + common/tam.py):
      backbone.conv1.conv/bn                   -> conv1 / bn1
      backbone.layer{s}.{j}.block.conv{k}.conv -> layer{s}_{j}/conv{k}
      ...block.downsample.conv/bn              -> downsample / bn_down
      ...tam.G.{0,1,3} (Linear/BN/Linear)      -> tam/{g_fc1,g_bn,g_fc2}
      ...tam.L.{0,1,3} (Conv1d/BN/Conv1d)      -> tam/{l_conv1,l_bn,
                                                  l_conv2}
    """
    p = backbone_prefix
    params: Dict = {"conv1": _conv2d(sd[p + "conv1.conv.weight"])}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn3d(sd, p + "conv1.bn")
    for s, blocks in enumerate(cfg.stage_blocks, start=1):
        for j in range(blocks):
            src = f"{p}layer{s}.{j}."
            dst = f"layer{s}_{j}"
            blk: Dict = {}
            blk_stats: Dict = {}
            for k in (1, 2, 3):
                blk[f"conv{k}"] = _conv2d(
                    sd[src + f"block.conv{k}.conv.weight"])
                blk[f"bn{k}"], blk_stats[f"bn{k}"] = _bn3d(
                    sd, src + f"block.conv{k}.bn")
            if src + "block.downsample.conv.weight" in sd:
                blk["downsample"] = _conv2d(
                    sd[src + "block.downsample.conv.weight"])
                blk["bn_down"], blk_stats["bn_down"] = _bn3d(
                    sd, src + "block.downsample.bn")
            tam: Dict = {
                "g_fc1": {"kernel": _np(sd[src + "tam.G.0.weight"]).T},
                "g_fc2": {"kernel": _np(sd[src + "tam.G.3.weight"]).T},
                "l_conv1": {"kernel": _np(
                    sd[src + "tam.L.0.weight"]).transpose(2, 1, 0)},
                "l_conv2": {"kernel": _np(
                    sd[src + "tam.L.3.weight"]).transpose(2, 1, 0)},
            }
            tam_stats: Dict = {}
            tam["g_bn"], tam_stats["g_bn"] = _bn3d(sd, src + "tam.G.1")
            tam["l_bn"], tam_stats["l_bn"] = _bn3d(sd, src + "tam.L.1")
            blk["tam"] = tam
            blk_stats["tam"] = tam_stats
            params[dst] = blk
            stats[dst] = blk_stats
    variables = {"params": params, "batch_stats": stats}
    if cls_head_key and cls_head_key + ".weight" in sd:
        variables = {
            "params": {"backbone": params,
                       "cls_head": {"fc_cls": _dense(sd, cls_head_key)}},
            "batch_stats": {"backbone": stats},
        }
    return variables


def convert_tpn(sd: Dict, cfg, neck_prefix: str = "neck.") -> Dict:
    """mmaction TPN neck checkpoint -> flax variables for models.tpn.TPN.

    Key map (necks/tpn.py):
      neck.spatial_modulation.spatial_modulation.{i}.{j}.conv/bn
                                             -> sm{i}_conv{j} / sm{i}_bn{j}
      neck.temporal_modulation_ops.{i}.conv.conv -> tm{i}/conv
      neck.downsample_ops.{i}.conv.conv          -> down{i}
      neck.level_fusion_{1,2}.downsamples.{i}.conv.conv/bn
                                             -> fuse_{td,bu}/down{i}(+bn)
      neck.level_fusion_{1,2}.fusion_conv.conv/bn -> fusion / fusion_bn
      neck.pyramid_fusion.conv/bn            -> pyramid_fusion/pyramid_bn
      neck.aux_head.conv.conv/bn + aux_head.fc -> aux_conv/aux_bn/aux_fc
    """
    p = neck_prefix
    params: Dict = {}
    stats: Dict = {}
    n = len(cfg.in_channels)
    for i in range(n):
        j = 0
        while (f"{p}spatial_modulation.spatial_modulation.{i}.{j}"
               f".conv.weight") in sd:
            src = f"{p}spatial_modulation.spatial_modulation.{i}.{j}."
            params[f"sm{i}_conv{j}"] = _conv3d(sd[src + "conv.weight"])
            params[f"sm{i}_bn{j}"], stats[f"sm{i}_bn{j}"] = _bn3d(
                sd, src + "bn")
            j += 1
        params[f"tm{i}"] = {"conv": _conv3d(
            sd[f"{p}temporal_modulation_ops.{i}.conv.conv.weight"])}
        if f"{p}downsample_ops.{i}.conv.conv.weight" in sd:
            params[f"down{i}"] = _conv3d(
                sd[f"{p}downsample_ops.{i}.conv.conv.weight"])
    for ref_lf, ours in (("level_fusion_1", "fuse_td"),
                         ("level_fusion_2", "fuse_bu")):
        blk: Dict = {}
        blk_stats: Dict = {}
        for i in range(n):
            src = f"{p}{ref_lf}.downsamples.{i}.conv."
            blk[f"down{i}"] = _conv3d(sd[src + "conv.weight"])
            blk[f"down_bn{i}"], blk_stats[f"down_bn{i}"] = _bn3d(
                sd, src + "bn")
        blk["fusion"] = _conv3d(sd[f"{p}{ref_lf}.fusion_conv.conv.weight"])
        blk["fusion_bn"], blk_stats["fusion_bn"] = _bn3d(
            sd, f"{p}{ref_lf}.fusion_conv.bn")
        params[ours] = blk
        stats[ours] = blk_stats
    params["pyramid_fusion"] = _conv3d(
        sd[p + "pyramid_fusion.conv.weight"])
    params["pyramid_bn"], stats["pyramid_bn"] = _bn3d(
        sd, p + "pyramid_fusion.bn")
    if p + "aux_head.conv.conv.weight" in sd:
        params["aux_conv"] = _conv3d(sd[p + "aux_head.conv.conv.weight"])
        params["aux_bn"], stats["aux_bn"] = _bn3d(
            sd, p + "aux_head.conv.bn")
        params["aux_fc"] = _dense(sd, p.rstrip(".") + ".aux_head.fc")
    return {"params": params, "batch_stats": stats}
