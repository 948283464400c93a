"""VideoMAE finetuned-checkpoint importer parity
(models/videomae_vit.py + convert_videomae) against a torch replica of
MCT/mmaction/models/backbones/videomae.py (split q/v bias, layer-scale,
sinusoid positions, mean-pool + fc_norm)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import (
    convert_videomae)
from cross_modal_video_engine_tpu.models.videomae_vit import (
    VideoMAEConfig, VideoMAEViT, sinusoid_table, videomae_config_from_sd)

torch.manual_seed(0)


class TAttn(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h = h
        self.qkv = tnn.Linear(d, 3 * d, bias=False)
        self.q_bias = tnn.Parameter(torch.randn(d) * 0.02)
        self.v_bias = tnn.Parameter(torch.randn(d) * 0.02)
        self.proj = tnn.Linear(d, d)

    def forward(self, x):
        B, N, d = x.shape
        bias = torch.cat([self.q_bias, torch.zeros_like(self.v_bias),
                          self.v_bias])
        qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(B, N, 3, self.h, d // self.h).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (d // self.h) ** -0.5, qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, d)
        return self.proj(out)


class TBlock(tnn.Module):
    def __init__(self, d, h, init_values):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = TAttn(d, h)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(d, 4 * d)
        self.mlp.fc2 = tnn.Linear(4 * d, d)
        if init_values > 0:
            self.gamma_1 = tnn.Parameter(init_values * torch.ones(d))
            self.gamma_2 = tnn.Parameter(init_values * torch.ones(d))
        else:
            self.gamma_1 = self.gamma_2 = None

    def forward(self, x):
        a = self.attn(self.norm1(x))
        if self.gamma_1 is not None:
            a = self.gamma_1 * a
        x = x + a
        m = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        if self.gamma_2 is not None:
            m = self.gamma_2 * m
        return x + m


class TVideoMAE(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.embed_dims
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv3d(
            3, d, (cfg.tubelet_size, cfg.patch_size, cfg.patch_size),
            stride=(cfg.tubelet_size, cfg.patch_size, cfg.patch_size))
        self.blocks = tnn.ModuleList([
            TBlock(d, cfg.num_heads, cfg.init_values)
            for _ in range(cfg.num_layers)])
        self.fc_norm = tnn.LayerNorm(d, eps=1e-6)
        self.pos = torch.from_numpy(
            sinusoid_table(cfg.num_patches, d)).float()

    def forward(self, x):
        x = self.patch_embed.proj(x)          # (B, D, t, h, w)
        B, d = x.shape[:2]
        x = x.flatten(2).transpose(1, 2)      # (B, N, D)
        x = x + self.pos
        for blk in self.blocks:
            x = blk(x)
        return self.fc_norm(x.mean(dim=1))


@pytest.mark.parametrize("init_values", [0.0, 0.1])
def test_videomae_conversion_parity(init_values):
    cfg = VideoMAEConfig(num_frames=4, img_size=32, patch_size=16,
                         tubelet_size=2, embed_dims=24, num_heads=2,
                         num_layers=2, init_values=init_values)
    tmodel = TVideoMAE(cfg).eval()
    sd = dict(tmodel.state_dict())

    x = np.random.default_rng(4).standard_normal(
        (2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 4, 1, 2, 3))).numpy()

    variables = convert_videomae(sd)
    model = VideoMAEViT(cfg)
    got = np.asarray(model.apply({"params": variables["params"]},
                                 jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_videomae_config_from_sd():
    cfg = VideoMAEConfig(num_frames=4, img_size=32, patch_size=16,
                         tubelet_size=2, embed_dims=24, num_heads=2,
                         num_layers=2, init_values=0.1)
    sd = dict(TVideoMAE(cfg).state_dict())
    kw = videomae_config_from_sd(sd, num_frames=4, img_size=32)
    assert kw["patch_size"] == 16 and kw["tubelet_size"] == 2
    assert kw["embed_dims"] == 24 and kw["num_layers"] == 2
    assert kw["init_values"] > 0


def test_videomae_finetuned_head_feeds_backbone_classifier():
    """A finetuned checkpoint's `head` Linear must land under
    params.cls_head.fc_cls (the BackboneClassifier layout) — a sibling
    'head' collection was silently dropped by every consumer."""
    from cross_modal_video_engine_tpu.models.recognizer import (
        BackboneClassifier)

    cfg = VideoMAEConfig(num_frames=4, img_size=32, patch_size=16,
                         tubelet_size=2, embed_dims=24, num_heads=2,
                         num_layers=2, init_values=0.1)
    sd = dict(TVideoMAE(cfg).state_dict())
    g = torch.Generator().manual_seed(0)
    sd["head.weight"] = torch.randn(5, 24, generator=g)
    sd["head.bias"] = torch.randn(5, generator=g)
    variables = convert_videomae(sd)
    assert set(variables["params"]) == {"backbone", "cls_head"}

    x = np.random.default_rng(5).standard_normal(
        (2, 4, 32, 32, 3)).astype(np.float32)
    model = BackboneClassifier(VideoMAEViT(cfg), num_classes=5,
                               dropout_ratio=0.0)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    feat = np.asarray(VideoMAEViT(cfg).apply(
        {"params": variables["params"]["backbone"]}, jnp.asarray(x)))
    want = feat @ sd["head.weight"].numpy().T + sd["head.bias"].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
