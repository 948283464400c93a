"""CSN (ir/ip) mmaction-checkpoint importer parity
(convert/torch_import.convert_csn) against a torch replica of
resnet3d_csn.py (depthwise Sequential conv2, temporal strides
(1, 2, 2, 2), BN eps 1e-3)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_csn
from cross_modal_video_engine_tpu.models.recognizer import (
    BackboneClassifier)
from cross_modal_video_engine_tpu.models.resnet3d import CSN, CSNConfig

torch.manual_seed(3)


class TConvBN(tnn.Module):
    def __init__(self, cin, cout, k, s, p, groups=1):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, k, s, p, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm3d(cout, eps=1e-3)

    def forward(self, x, relu=True):
        x = self.bn(self.conv(x))
        return torch.relu(x) if relu else x


class TCSNBlock(tnn.Module):
    def __init__(self, cin, planes, s, t, mode):
        super().__init__()
        self.conv1 = TConvBN(cin, planes, 1, 1, 0)
        seq = []
        if mode == "ip":
            seq.append(TConvBN(planes, planes, 1, 1, 0))
        seq.append(TConvBN(planes, planes, 3, (t, s, s), 1, groups=planes))
        self.conv2 = tnn.ModuleList(seq)
        self.mode = mode
        self.conv3 = TConvBN(planes, planes * 4, 1, 1, 0)
        self.down = (s != 1 or t != 1 or cin != planes * 4)
        if self.down:
            self.downsample = TConvBN(cin, planes * 4, 1, (t, s, s), 0)

    def forward(self, x):
        out = self.conv1(x)
        if self.mode == "ip":
            out = self.conv2[0](out, relu=False)   # pointwise: bn, no act
        out = self.conv2[-1](out)                  # depthwise: bn + relu
        out = self.conv3(out, relu=False)
        sc = self.downsample(x, relu=False) if self.down else x
        return torch.relu(out + sc)

    # expose mmaction-style Sequential keys (conv2.0 / conv2.1)
    # ModuleList already names children 0/1, matching nn.Sequential.


class TCSN(tnn.Module):
    def __init__(self, cfg, num_classes):
        super().__init__()
        self.backbone = tnn.Module()
        bb = self.backbone
        c0 = cfg.base_channels
        bb.conv1 = TConvBN(3, c0, (3, 7, 7), (1, 2, 2), (1, 3, 3))
        bb.pool = tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        cin, planes = c0, c0
        for i, blocks in enumerate(cfg.stage_blocks):
            s = 1 if i == 0 else 2
            t = cfg.temporal_strides[i]
            layers = [TCSNBlock(cin, planes, s, t, cfg.mode)]
            cin = planes * 4
            for _ in range(1, blocks):
                layers.append(TCSNBlock(cin, planes, 1, 1, cfg.mode))
            setattr(bb, f"layer{i+1}", tnn.Sequential(*layers))
            planes *= 2
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(cin, num_classes)

    def forward(self, x):
        bb = self.backbone
        x = bb.pool(bb.conv1(x))
        for i in range(4):
            x = getattr(bb, f"layer{i+1}")(x)
        return self.cls_head.fc_cls(x.mean(dim=(2, 3, 4)))


@pytest.mark.parametrize("mode", ["ir", "ip"])
def test_csn_conversion_parity(mode):
    cfg = CSNConfig(stage_blocks=(1, 1, 1, 1), base_channels=8, mode=mode)
    tmodel = TCSN(cfg, num_classes=4).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = dict(tmodel.state_dict())

    x = np.random.default_rng(8).standard_normal(
        (2, 8, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

    variables = convert_csn(sd, cfg)
    model = BackboneClassifier(CSN(cfg), num_classes=4, dropout_ratio=0.0)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
