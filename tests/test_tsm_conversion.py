"""TSM (ResNetTSM) checkpoint importer parity
(convert/torch_import.convert_tsm) against a torch replica: a
torchvision-grammar 2D ResNet with the parameter-free temporal shift
before each block's conv1 (mmaction backbones/resnet_tsm.py)."""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_tsm
from cross_modal_video_engine_tpu.models.backbones2d import (TSMConfig,
                                                             TSMResNet)
from cross_modal_video_engine_tpu.models.heads import TSNHead
from cross_modal_video_engine_tpu.models.recognizer import Recognizer2D

torch.manual_seed(4)


def tshift(x, T, div=8):
    """(B*T, C, H, W) temporal shift, mmaction resnet_tsm.py semantics."""
    bt, c, h, w = x.shape
    x = x.view(bt // T, T, c, h, w)
    fold = c // div
    out = torch.zeros_like(x)
    out[:, :-1, :fold] = x[:, 1:, :fold]
    out[:, 1:, fold:2 * fold] = x[:, :-1, fold:2 * fold]
    out[:, :, 2 * fold:] = x[:, :, 2 * fold:]
    return out.view(bt, c, h, w)


class TBlock(tnn.Module):
    def __init__(self, cin, planes, stride, T, div):
        super().__init__()
        self.T, self.div = T, div
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.down = stride != 1 or cin != planes * 4
        if self.down:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        h = tshift(x, self.T, self.div)
        out = torch.relu(self.bn1(self.conv1(h)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.downsample(x) if self.down else x
        return torch.relu(out + sc)


class TTSM(tnn.Module):
    def __init__(self, cfg, T, num_classes):
        super().__init__()
        self.backbone = tnn.Module()
        bb = self.backbone
        c0 = cfg.base_channels
        bb.conv1 = tnn.Conv2d(3, c0, 7, 2, 3, bias=False)
        bb.bn1 = tnn.BatchNorm2d(c0)
        bb.pool = tnn.MaxPool2d(3, 2, 1)
        cin, planes = c0, c0
        for i, blocks in enumerate(cfg.stage_blocks):
            stride = 1 if i == 0 else 2
            layers = [TBlock(cin, planes, stride, T, cfg.shift_div)]
            cin = planes * 4
            for _ in range(1, blocks):
                layers.append(TBlock(cin, planes, 1, T, cfg.shift_div))
            setattr(bb, f"layer{i+1}", tnn.Sequential(*layers))
            planes *= 2
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(cin, num_classes)

    def forward(self, x):          # (B, T, C, H, W)
        B, T = x.shape[:2]
        x = x.flatten(0, 1)
        bb = self.backbone
        x = bb.pool(torch.relu(bb.bn1(bb.conv1(x))))
        for i in range(4):
            x = getattr(bb, f"layer{i+1}")(x)
        x = x.mean(dim=(2, 3)).view(B, T, -1).mean(dim=1)   # consensus
        return self.cls_head.fc_cls(x)


def test_tsm_conversion_parity():
    cfg = TSMConfig(stage_blocks=(1, 1, 1, 1), base_channels=8)
    T = 4
    tmodel = TTSM(cfg, T, num_classes=5).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = dict(tmodel.state_dict())

    x = np.random.default_rng(9).standard_normal(
        (2, T, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3))).numpy()

    variables = convert_tsm(sd, cfg)
    model = Recognizer2D(TSMResNet(cfg),
                         TSNHead(5, dropout_ratio=0.0))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_tsm_conversion_mmaction_grammar():
    """The same weights renamed to mmaction's ConvModule grammar
    (conv{k}.conv/bn, downsample.conv/bn, and the TemporalShift wrapper
    nesting conv1's weight under conv1.conv.net) convert identically."""
    cfg = TSMConfig(stage_blocks=(1, 1, 1, 1), base_channels=8)
    T = 4
    tmodel = TTSM(cfg, T, num_classes=5).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd_tv = dict(tmodel.state_dict())

    def rename(k):
        # stem: conv1.weight -> conv1.conv.weight; bn1.* -> conv1.bn.*
        if k.startswith("backbone.conv1."):
            return k.replace("backbone.conv1.", "backbone.conv1.conv.")
        if k.startswith("backbone.bn1."):
            return k.replace("backbone.bn1.", "backbone.conv1.bn.")
        # blocks: convk.weight -> convk.conv[.net for conv1].weight,
        # bnk -> convk.bn, downsample.0/.1 -> downsample.conv/bn
        import re
        m = re.match(r"(backbone\.layer\d\.\d\.)(.*)", k)
        if not m:
            return k
        head, tail = m.groups()
        tail = re.sub(r"^conv1\.(weight)$", r"conv1.conv.net.\1", tail)
        tail = re.sub(r"^conv(\d)\.(weight)$", r"conv\1.conv.\2", tail)
        tail = re.sub(r"^bn(\d)\.", r"conv\1.bn.", tail)
        tail = tail.replace("downsample.0.", "downsample.conv.")
        tail = tail.replace("downsample.1.", "downsample.bn.")
        return head + tail

    sd_mm = {rename(k): v for k, v in sd_tv.items()
             if "num_batches_tracked" not in k}

    x = np.random.default_rng(10).standard_normal(
        (2, T, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3))).numpy()

    variables = convert_tsm(sd_mm, cfg)
    model = Recognizer2D(TSMResNet(cfg), TSNHead(5, dropout_ratio=0.0))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
