"""Video Swin weight-conversion parity: a tiny torch model with mmaction's
swin_transformer.py state-dict naming vs the converted flax Swin3D."""

import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_swin3d
from cross_modal_video_engine_tpu.models.swin3d import (
    Swin3D, Swin3DConfig, relative_position_index, shifted_window_mask)

rng = np.random.default_rng(701)

CFG = Swin3DConfig(embed_dim=8, depths=(2, 1), num_heads=(2, 2),
                   window_size=(2, 2, 2), patch_size=(1, 2, 2),
                   drop_path_max=0.0)


def _partition(x, w):
    B, D, H, W, C = x.shape
    x = x.view(B, D // w[0], w[0], H // w[1], w[1], W // w[2], w[2], C)
    return x.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, w[0] * w[1] * w[2], C)


def _reverse(x, w, B, D, H, W):
    C = x.shape[-1]
    x = x.view(B, D // w[0], H // w[1], W // w[2], w[0], w[1], w[2], C)
    return x.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, D, H, W, C)


class TWinAttn(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.heads, self.window = heads, window
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        n = (2 * window[0] - 1) * (2 * window[1] - 1) * (2 * window[2] - 1)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn(n, heads) * 0.05)
        self.register_buffer(
            "relative_position_index",
            torch.from_numpy(relative_position_index(window)).long())

    def forward(self, x, mask=None):
        nB, N, C = x.shape
        hd = C // self.heads
        q, k, v = self.qkv(x).reshape(
            nB, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, self.heads)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(-1, nW, self.heads, N, N) + \
                mask[None, :, None]
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(nB, N, C)
        return self.proj(out)


class TBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TWinAttn(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        B, D, H, W, C = x.shape
        h = self.norm1(x)
        if any(self.shift):
            h = torch.roll(h, tuple(-s for s in self.shift), (1, 2, 3))
            mask = torch.from_numpy(shifted_window_mask(
                (D, H, W), self.window, self.shift))
        else:
            mask = None
        hw = self.attn(_partition(h, self.window), mask)
        h = _reverse(hw, self.window, B, D, H, W)
        if any(self.shift):
            h = torch.roll(h, self.shift, (1, 2, 3))
        x = x + h
        return x + self.mlp.fc2(tF.gelu(self.mlp.fc1(self.norm2(x))))


class TSwin(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv3d(3, cfg.embed_dim,
                                           cfg.patch_size, cfg.patch_size)
        self.patch_embed.norm = tnn.LayerNorm(cfg.embed_dim)
        self.layers = tnn.ModuleList()
        dim = cfg.embed_dim
        for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            layer = tnn.Module()
            layer.blocks = tnn.ModuleList([
                TBlock(dim, heads, cfg.window_size,
                       (0, 0, 0) if j % 2 == 0 else
                       tuple(w // 2 for w in cfg.window_size))
                for j in range(depth)])
            if i < len(cfg.depths) - 1:
                layer.downsample = tnn.Module()
                layer.downsample.norm = tnn.LayerNorm(4 * dim)
                layer.downsample.reduction = tnn.Linear(4 * dim, 2 * dim,
                                                        bias=False)
                dim *= 2
            self.layers.append(layer)
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):                      # (B, T, H, W, 3)
        x = self.patch_embed.proj(x.permute(0, 4, 1, 2, 3))
        x = x.permute(0, 2, 3, 4, 1)           # (B, D, H, W, C)
        x = self.patch_embed.norm(x)
        for i, layer in enumerate(self.layers):
            for blk in layer.blocks:
                x = blk(x)
            if hasattr(layer, "downsample"):
                x = torch.cat([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                               x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]],
                              -1)
                x = layer.downsample.reduction(layer.downsample.norm(x))
        x = self.norm(x)
        return x.mean((1, 2, 3))


@pytest.mark.full    # full lane: importer parity; Swin3D window math stays default in test_swin3d
def test_swin3d_conversion_parity():
    torch.manual_seed(29)
    tm = TSwin(CFG).eval()
    variables = convert_swin3d(tm.state_dict(), CFG, backbone_prefix="")
    fm = Swin3D(CFG)

    videos = rng.standard_normal((2, 4, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(videos)).numpy()
    got = fm.apply(variables, jnp.asarray(videos))
    assert got.shape == want.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)
