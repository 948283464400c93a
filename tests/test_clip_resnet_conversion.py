"""RN50x4-layout CLIP + Combiner weight-conversion parity.

Tiny torch models with the exact state-dict naming of the checkpoints the
reference loads (RN50x4 via clip.load, MultiFusion/src/inference.py:179-196;
combiner_arithmetic.pt, :218-223) are built fresh here, randomly initialized,
converted, and compared numerically against the flax towers.
"""

import pytest
from collections import OrderedDict

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert import (
    convert_clip_resnet, clip_resnet_config_from_sd,
    convert_combiner, combiner_config_from_sd)
from cross_modal_video_engine_tpu.models.clip_resnet import (
    CLIPResNetConfig, CLIPResNetModel)
from cross_modal_video_engine_tpu.models.combiner import (
    Combiner, CombinerConfig)

rng = np.random.default_rng(77)

CFG = CLIPResNetConfig(embed_dim=24, vision_layers=(1, 1, 1, 1),
                       vision_width=16, image_resolution=64,
                       context_length=10, vocab_size=50,
                       text_width=16, text_heads=2, text_layers=1)


class TBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.stride = stride
        self.downsample = None
        if stride > 1 or cin != planes * 4:
            self.downsample = tnn.Sequential(OrderedDict([
                ("-1", tnn.AvgPool2d(stride)),
                ("0", tnn.Conv2d(cin, planes * 4, 1, bias=False)),
                ("1", tnn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        if self.stride > 1:
            out = tF.avg_pool2d(out, self.stride)
        out = self.bn3(self.conv3(out))
        sc = self.downsample(x) if self.downsample is not None else x
        return tF.relu(out + sc)


class TAttnPool(tnn.Module):
    def __init__(self, spacial, dim, heads, out_dim):
        super().__init__()
        self.positional_embedding = tnn.Parameter(
            torch.randn(spacial ** 2 + 1, dim) / dim ** 0.5)
        self.q_proj = tnn.Linear(dim, dim)
        self.k_proj = tnn.Linear(dim, dim)
        self.v_proj = tnn.Linear(dim, dim)
        self.c_proj = tnn.Linear(dim, out_dim)
        self.heads = heads

    def forward(self, x):
        B, C = x.shape[0], x.shape[1]
        x = x.flatten(2).permute(2, 0, 1)                    # (HW, B, C)
        x = torch.cat([x.mean(0, keepdim=True), x], 0)
        x = x + self.positional_embedding[:, None]
        hd = C // self.heads
        q = self.q_proj(x[:1]).reshape(1, B, self.heads, hd)
        k = self.k_proj(x).reshape(-1, B, self.heads, hd)
        v = self.v_proj(x).reshape(-1, B, self.heads, hd)
        w = torch.softmax(
            torch.einsum("qbhd,kbhd->bhqk", q, k) / hd ** 0.5, -1)
        o = torch.einsum("bhqk,kbhd->qbhd", w, v).reshape(1, B, C)
        return self.c_proj(o[0])


class TVisualRN(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        w = cfg.vision_width
        self.conv1 = tnn.Conv2d(3, w // 2, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w // 2)
        self.conv2 = tnn.Conv2d(w // 2, w // 2, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(w // 2)
        self.conv3 = tnn.Conv2d(w // 2, w, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(w)
        self.layer1 = tnn.Sequential(TBottleneck(w, w))
        self.layer2 = tnn.Sequential(TBottleneck(w * 4, w * 2, 2))
        self.layer3 = tnn.Sequential(TBottleneck(w * 8, w * 4, 2))
        self.layer4 = tnn.Sequential(TBottleneck(w * 16, w * 8, 2))
        self.attnpool = TAttnPool(cfg.image_resolution // 32, w * 32,
                                  w * 32 // 64, cfg.embed_dim)

    def forward(self, x):
        for conv, bn in ((self.conv1, self.bn1), (self.conv2, self.bn2),
                         (self.conv3, self.bn3)):
            x = tF.relu(bn(conv(x)))
        x = tF.avg_pool2d(x, 2)
        x = self.layer2(self.layer1(x))
        middle = self.layer3(x)
        high = self.attnpool(self.layer4(middle))
        return high, middle


class TTextBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(d, d * 4)),
            ("gelu", tnn.Identity()),
            ("c_proj", tnn.Linear(d * 4, d)),
        ]))
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x, mask):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        h = self.ln_2(x)
        h = self.mlp.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)      # QuickGELU
        return x + self.mlp.c_proj(h)


class TCLIPRN(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.visual = TVisualRN(cfg)
        tw = cfg.text_width
        self.token_embedding = tnn.Embedding(cfg.vocab_size, tw)
        self.positional_embedding = tnn.Parameter(
            torch.randn(cfg.context_length, tw) * 0.05)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TTextBlock(tw, cfg.text_heads) for _ in range(cfg.text_layers)])
        self.ln_final = tnn.LayerNorm(tw)
        self.text_projection = tnn.Parameter(
            torch.randn(tw, cfg.embed_dim) * 0.05)
        self.logit_scale = tnn.Parameter(
            torch.tensor(float(np.log(1 / 0.07))))

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


@pytest.mark.full    # full lane: importer parity; RN50x4 middle-stage behavior stays default in test_clip_resnet
def test_clip_resnet_conversion_parity():
    torch.manual_seed(3)
    tm = TCLIPRN(CFG).eval()
    sd = tm.state_dict()

    derived = clip_resnet_config_from_sd(sd)
    assert derived["vision_layers"] == (1, 1, 1, 1)
    assert derived["vision_width"] == CFG.vision_width
    assert derived["embed_dim"] == CFG.embed_dim
    assert derived["image_resolution"] == CFG.image_resolution
    assert derived["text_layers"] == CFG.text_layers

    variables = convert_clip_resnet(sd, CFG)
    fm = CLIPResNetModel(CFG)

    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want_high, want_middle = tm.visual(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    got_high, got_middle = fm.apply(variables, jnp.asarray(imgs),
                                    method="encode_image")
    np.testing.assert_allclose(np.asarray(got_high), want_high.numpy(),
                               rtol=2e-4, atol=2e-4)
    # middle token order = the reference's no-transpose NCHW reshape
    B, C, H, W = want_middle.shape
    want_tokens = want_middle.reshape(B, H * W, C).numpy()
    np.testing.assert_allclose(np.asarray(got_middle), want_tokens,
                               rtol=2e-4, atol=2e-4)

    ids = np.zeros((2, 10), np.int64)
    ids[0, :4] = [48, 3, 7, 49]
    ids[1, :6] = [48, 9, 12, 4, 2, 49]
    with torch.no_grad():
        want_txt = tm.encode_text(torch.from_numpy(ids)).numpy()
    got_txt = fm.apply(variables, jnp.asarray(ids, jnp.int32),
                       method="encode_text")
    np.testing.assert_allclose(np.asarray(got_txt), want_txt,
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Combiner
# ---------------------------------------------------------------------------

class TCombinerAttn(tnn.Module):
    """Reference ResidualAttentionBlock (combiner.py:19-43) naming."""

    def __init__(self, d, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(d, d * 4)),
            ("gelu", tnn.Identity()),
            ("c_proj", tnn.Linear(d * 4, d)),
        ]))
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, q, k, v):
        attn = self.attn(self.ln_1(q), self.ln_1(k), self.ln_1(v),
                         need_weights=False)[0]
        x = v.mean(dim=0) + attn
        h = self.mlp.c_fc(self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)
        return x + self.mlp.c_proj(h)


class TCombiner(tnn.Module):
    """Reference Combiner (combiner.py:81-180) state-dict naming."""

    def __init__(self, d, proj, hidden, heads=8):
        super().__init__()
        self.text_projection_layer = tnn.Linear(d, proj)
        self.image_projection_layer = tnn.Linear(d, proj)
        self.combiner_layer = tnn.Linear(proj * 2, hidden)
        self.output_layer = tnn.Linear(hidden, d)
        self.dynamic_scalar = tnn.Sequential(
            tnn.Linear(proj * 2, hidden), tnn.ReLU(), tnn.Dropout(0.5),
            tnn.Linear(hidden, 1), tnn.Sigmoid())
        self.m_remained = tnn.Conv2d(d, d, (1, 1))
        self.m_residual = tnn.Linear(d, d)
        self.self_attn_1 = TCombinerAttn(d, heads)

    def combine(self, image_features, text_features):
        high, middle = image_features
        b, f, l, d = middle.shape
        p_s_m = tF.relu(self.m_remained(
            middle.reshape(b * f, -1, 4, 4)).reshape(b, f, l, -1))
        p_r_m = tF.relu(self.m_residual(text_features))
        based = self.self_attn_1(
            p_r_m.reshape(-1, b, d), p_s_m.reshape(l * f, b, d),
            p_s_m.reshape(l * f, b, d)).squeeze(dim=0)
        based = tF.relu(based)
        high = high.mean(dim=1)
        tp = tF.relu(self.text_projection_layer(text_features))
        ip = tF.relu(self.image_projection_layer(high))
        raw = torch.cat((ip, tp), -1)
        combined = tF.relu(self.combiner_layer(raw))
        ds = self.dynamic_scalar(raw)
        out = (self.output_layer(combined) + ds * text_features
               + (1 - ds) * high + based.reshape(b, d))
        return tF.normalize(out, dim=-1)

    def forward(self, image_features, text_features, target_high):
        pred = self.combine(image_features, text_features)
        tgt = tF.normalize(target_high.mean(dim=1), dim=-1)
        return 100 * pred @ tgt.T


def test_combiner_conversion_parity():
    torch.manual_seed(5)
    D, PROJ, HID, F_, L = 32, 24, 40, 2, 16
    tm = TCombiner(D, PROJ, HID).eval()
    sd = tm.state_dict()

    cfg_kwargs = combiner_config_from_sd(sd)
    assert cfg_kwargs == dict(clip_feature_dim=D, projection_dim=PROJ,
                              hidden_dim=HID, middle_mix="conv4x4")
    variables = convert_combiner(sd)
    fm = Combiner(CombinerConfig(**cfg_kwargs))

    # b=1: the inference contract (reference reshapes are only
    # permutation-free at batch 1, combiner.py:165-168)
    high = rng.standard_normal((1, F_, D)).astype(np.float32)
    middle = rng.standard_normal((1, F_, L, D)).astype(np.float32)
    text = rng.standard_normal((1, D)).astype(np.float32)
    tgt = rng.standard_normal((3, F_, D)).astype(np.float32)

    with torch.no_grad():
        want_pred = tm.combine(
            (torch.from_numpy(high), torch.from_numpy(middle)),
            torch.from_numpy(text)).numpy()
        want_logits = tm(
            (torch.from_numpy(high), torch.from_numpy(middle)),
            torch.from_numpy(text), torch.from_numpy(tgt)).numpy()

    got_pred = fm.apply(variables, (jnp.asarray(high), jnp.asarray(middle)),
                        jnp.asarray(text), method="combine_features")
    np.testing.assert_allclose(np.asarray(got_pred), want_pred,
                               rtol=2e-4, atol=2e-4)
    got_logits = fm.apply(variables, (jnp.asarray(high), jnp.asarray(middle)),
                          jnp.asarray(text), (jnp.asarray(tgt), None))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits,
                               rtol=2e-4, atol=2e-4)


def test_conv4x4_middle_mix_matches_torch_any_batch():
    """The (B*F, C, 16)-view Dense equals torch's reshape->1x1-conv for
    B>1 too (it's the same memory reinterpretation)."""
    torch.manual_seed(9)
    D, L, B, F_ = 32, 16, 3, 2
    conv = tnn.Conv2d(D, D, (1, 1)).eval()
    middle = rng.standard_normal((B, F_, L, D)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(middle)
        want = conv(t.reshape(B * F_, -1, 4, 4)).reshape(B, F_, L, -1).numpy()

    kernel = conv.weight.detach().numpy()[:, :, 0, 0].T    # (C_in, C_out)
    bias = conv.bias.detach().numpy()
    xc = jnp.asarray(middle).reshape(B * F_, L * D // 16, 16)
    got = (jnp.einsum("bcs,co->bos", xc, jnp.asarray(kernel))
           + jnp.asarray(bias)[None, :, None]).reshape(B, F_, L, D)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
