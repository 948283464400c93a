"""CLIP weight conversion parity: tiny OpenAI-layout torch CLIP vs the
converted flax CLIPModel."""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert import convert_clip_vit
from cross_modal_video_engine_tpu.models.clip import CLIPConfig, CLIPModel

rng = np.random.default_rng(211)

CFG = CLIPConfig(embed_dim=16, image_resolution=32, vision_width=24,
                 vision_layers=2, vision_heads=2, patch_size=8,
                 context_length=10, vocab_size=50, text_width=20,
                 text_heads=2, text_layers=2)


class QuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class Block(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential()
        self.mlp.c_fc = tnn.Linear(d, d * 4)
        self.mlp.gelu = QuickGELU()
        self.mlp.c_proj = tnn.Linear(d * 4, d)
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x, mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TorchCLIP(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        w = cfg.vision_width
        self.visual = tnn.Module()
        self.visual.conv1 = tnn.Conv2d(3, w, cfg.patch_size, cfg.patch_size,
                                       bias=False)
        self.visual.class_embedding = tnn.Parameter(torch.randn(w) * 0.05)
        self.visual.positional_embedding = tnn.Parameter(
            torch.randn(cfg.grid ** 2 + 1, w) * 0.05)
        self.visual.ln_pre = tnn.LayerNorm(w)
        self.visual.transformer = tnn.Module()
        self.visual.transformer.resblocks = tnn.ModuleList(
            [Block(w, cfg.vision_heads) for _ in range(cfg.vision_layers)])
        self.visual.ln_post = tnn.LayerNorm(w)
        self.visual.proj = tnn.Parameter(torch.randn(w, cfg.embed_dim) * 0.05)

        tw = cfg.text_width
        self.token_embedding = tnn.Embedding(cfg.vocab_size, tw)
        self.positional_embedding = tnn.Parameter(
            torch.randn(cfg.context_length, tw) * 0.05)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [Block(tw, cfg.text_heads) for _ in range(cfg.text_layers)])
        self.ln_final = tnn.LayerNorm(tw)
        self.text_projection = tnn.Parameter(torch.randn(tw, cfg.embed_dim)
                                             * 0.05)
        self.logit_scale = tnn.Parameter(torch.tensor(np.log(1 / 0.07),
                                                      dtype=torch.float32))

    def encode_image(self, x):
        x = self.visual.conv1(x)                        # (B, w, g, g)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.visual.class_embedding + torch.zeros(
            x.shape[0], 1, x.shape[-1])
        x = torch.cat([cls, x], dim=1) + self.visual.positional_embedding
        x = self.visual.ln_pre(x).permute(1, 0, 2)
        for b in self.visual.transformer.resblocks:
            x = b(x)
        x = x.permute(1, 0, 2)
        middle = x[:, 1:, :]
        pooled = self.visual.ln_post(x[:, 0, :])
        return pooled @ self.visual.proj, middle

    def encode_text(self, ids):
        L = ids.shape[1]
        x = self.token_embedding(ids) + self.positional_embedding[:L]
        mask = torch.full((L, L), float("-inf")).triu(1)
        x = x.permute(1, 0, 2)
        for b in self.transformer.resblocks:
            x = b(x, mask)
        x = self.ln_final(x.permute(1, 0, 2))
        eot = ids.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ self.text_projection


def _flat_sd(model):
    return {k: v for k, v in model.state_dict().items()}


def test_clip_conversion_parity():
    torch.manual_seed(1)
    tm = TorchCLIP(CFG).eval()
    variables = convert_clip_vit(_flat_sd(tm), CFG)
    fm = CLIPModel(CFG)

    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want_high, want_middle = tm.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    got_high, got_middle = fm.apply(variables, jnp.asarray(imgs),
                                    method="encode_image")
    np.testing.assert_allclose(np.asarray(got_high), want_high.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_middle), want_middle.numpy(),
                               rtol=2e-4, atol=2e-4)

    ids = np.zeros((2, 10), np.int64)
    ids[0, :4] = [48, 3, 7, 49]
    ids[1, :6] = [48, 9, 12, 4, 2, 49]
    with torch.no_grad():
        want_txt = tm.encode_text(torch.from_numpy(ids)).numpy()
    got_txt = fm.apply(variables, jnp.asarray(ids, jnp.int32),
                       method="encode_text")
    np.testing.assert_allclose(np.asarray(got_txt), want_txt, rtol=2e-4,
                               atol=2e-4)
