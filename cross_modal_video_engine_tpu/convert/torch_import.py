"""Torch checkpoint importers.

Converts reference-format torch checkpoints into this framework's flax
variable trees so published weights run on TPU:

* `convert_linas_dual_encoding` — LINAS .pth.tar checkpoints ('model' is a
  LIST of sub-state-dicts in BaseModel.state_dict order,
  LINAS-engine/model.py:385-403);
* `convert_clip_vit` — OpenAI-layout CLIP ViT state dicts (the format the
  MultiFusion vendored clip.load produces).

All converters are pure dict->dict transforms over numpy arrays; torch is
only needed to unpickle .pth files (`load_torch_checkpoint`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

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


def _ts_ln(sd: Dict, name: str) -> Dict:
    return {"ln": {"scale": _np(sd[f"{name}.weight"]),
                   "bias": _np(sd[f"{name}.bias"])}}


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
# CLIP ViT (OpenAI layout)
# --------------------------------------------------------------------------

def _ln(sd: Dict, name: str) -> Dict:
    return {"ln": {"scale": _np(sd[f"{name}.weight"]),
                   "bias": _np(sd[f"{name}.bias"])}}


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
