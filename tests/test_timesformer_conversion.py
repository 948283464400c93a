"""TimeSformer mmaction-checkpoint conversion parity.

A torch replica with mmaction's exact state-dict naming and the reference
divided space-time forward math (mmaction/models/common/transformer.py)
is random-initialized, converted, and must match the flax TimeSformer
through Recognizer3D end-to-end.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import (
    convert_timesformer)
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3D
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig

rng = np.random.default_rng(351)

T, IMG, PATCH, D, HEADS, LAYERS, NCLS = 2, 16, 8, 16, 2, 2, 5
P = (IMG // PATCH) ** 2


class TorchDividedBlock(tnn.Module):
    """mmcv BaseTransformerLayer(divided) naming + reference math."""

    def __init__(self):
        super().__init__()
        self.attentions = tnn.ModuleList()
        for _ in range(2):
            m = tnn.Module()
            m.norm = tnn.LayerNorm(D, eps=1e-6)
            m.attn = tnn.MultiheadAttention(D, HEADS)
            self.attentions.append(m)
        self.attentions[0].temporal_fc = tnn.Linear(D, D)
        self.ffns = tnn.ModuleList([tnn.Module()])
        self.ffns[0].norm = tnn.LayerNorm(D, eps=1e-6)
        self.ffns[0].layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(D, 4 * D)), tnn.Linear(4 * D, D))

    def forward(self, x, b):
        # temporal attention (transformer.py:63-87)
        init_cls = x[:, :1]
        qt = x[:, 1:]
        _, pt, _ = qt.shape
        p = pt // T
        q = self.attentions[0].norm(qt.reshape(b * p, T, D)).permute(1, 0, 2)
        r = self.attentions[0].attn(q, q, q)[0].permute(1, 0, 2)
        r = self.attentions[0].temporal_fc(r.reshape(b, p * T, D))
        qt = qt + r
        x = torch.cat([init_cls, qt], 1)
        # spatial attention (transformer.py:141-177)
        identity = x
        init_cls = x[:, :1]
        qs = x[:, 1:]
        cls_rep = init_cls.repeat(1, T, 1).reshape(b * T, 1, D)
        qs = qs.reshape(b, p, T, D).permute(0, 2, 1, 3).reshape(b * T, p, D)
        qs = torch.cat([cls_rep, qs], 1)
        q = self.attentions[1].norm(qs).permute(1, 0, 2)
        r = self.attentions[1].attn(q, q, q)[0].permute(1, 0, 2)
        cls_res = r[:, :1].reshape(b, T, D).mean(1, keepdim=True)
        pr = r[:, 1:].reshape(b, T, p, D).permute(0, 2, 1, 3).reshape(
            b, p * T, D)
        x = identity + torch.cat([cls_res, pr], 1)
        # ffn with pre-norm
        h = self.ffns[0].norm(x)
        h = self.ffns[0].layers[0][0](h)
        h = torch.nn.functional.gelu(h)
        h = self.ffns[0].layers[1](h)
        return x + h


class TorchTimeSformer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = tnn.Module()
        bb = self.backbone
        bb.patch_embed = tnn.Module()
        bb.patch_embed.projection = tnn.Conv2d(3, D, PATCH, PATCH)
        bb.cls_token = tnn.Parameter(torch.randn(1, 1, D) * 0.05)
        bb.pos_embed = tnn.Parameter(torch.randn(1, P + 1, D) * 0.05)
        bb.time_embed = tnn.Parameter(torch.randn(1, T, D) * 0.05)
        bb.norm = tnn.LayerNorm(D, eps=1e-6)
        bb.transformer_layers = tnn.Module()
        bb.transformer_layers.layers = tnn.ModuleList(
            [TorchDividedBlock() for _ in range(LAYERS)])
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(D, NCLS)

    def forward(self, videos):
        """videos: (B, T, H, W, 3) float; mirrors timesformer.py:258-281."""
        b = videos.shape[0]
        x = videos.permute(0, 1, 4, 2, 3).reshape(b * T, 3, IMG, IMG)
        x = self.backbone.patch_embed.projection(x)
        x = x.flatten(2).transpose(1, 2)                 # (b*T, P, D)
        cls = self.backbone.cls_token.expand(x.size(0), -1, -1)
        x = torch.cat([cls, x], 1) + self.backbone.pos_embed
        cls_tokens = x[:b, :1]                           # first-frame CLS
        patches = x[:, 1:].reshape(b, T, P, D).permute(0, 2, 1, 3)
        patches = patches + self.backbone.time_embed
        x = torch.cat([cls_tokens, patches.reshape(b, P * T, D)], 1)
        for blk in self.backbone.transformer_layers.layers:
            x = blk(x, b)
        x = self.backbone.norm(x)
        return self.cls_head.fc_cls(x[:, 0])


def test_timesformer_conversion_parity():
    torch.manual_seed(2)
    tm = TorchTimeSformer().eval()
    sd = tm.state_dict()
    cfg = TimeSformerConfig(num_frames=T, img_size=IMG, patch_size=PATCH,
                            embed_dims=D, num_heads=HEADS, num_layers=LAYERS,
                            drop_path_max=0.0)
    variables = convert_timesformer(sd, cfg)
    model = Recognizer3D(cfg, num_classes=NCLS)

    v = rng.standard_normal((2, T, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(v)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
