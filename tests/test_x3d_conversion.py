"""X3D mmaction-checkpoint importer parity
(convert/torch_import.convert_x3d) against a torch replica of
MCT/mmaction/models/backbones/x3d.py (norm-free spatial stem + depthwise
temporal stem, expanded depthwise bottlenecks with half-style SE and
swish, conv5, two-layer head)."""

import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_x3d
from cross_modal_video_engine_tpu.models.recognizer import X3DClassifier
from cross_modal_video_engine_tpu.models.resnet3d import (X3D, X3DConfig,
                                                          se_round_width)
from tests.test_resnet3d_conversion import (TConvModule,
                                            _randomize_bn_stats)

torch.manual_seed(2)


class TSE(tnn.Module):
    def __init__(self, c):
        super().__init__()
        mid = se_round_width(c / 16)
        self.fc1 = tnn.Conv3d(c, mid, 1)
        self.fc2 = tnn.Conv3d(mid, c, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3, 4), keepdim=True)
        return x * torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))


class TX3DBlock(tnn.Module):
    def __init__(self, cin, planes, inner, stride, use_se):
        super().__init__()
        self.conv1 = TConvModule(cin, inner, 1, 1, 0)
        self.conv2 = TConvModule(inner, inner, 3, (1, stride, stride), 1)
        self.conv2.conv.groups = inner
        self.conv2.conv = tnn.Conv3d(inner, inner, 3,
                                     (1, stride, stride), 1, groups=inner,
                                     bias=False)
        if use_se:
            self.se_module = TSE(inner)
        self.use_se = use_se
        self.conv3 = TConvModule(inner, planes, 1, 1, 0)
        self.down = (stride != 1 or cin != planes)
        if self.down:
            self.downsample = TConvModule(cin, planes, 1,
                                          (1, stride, stride), 0)

    def forward(self, x):
        out = self.conv2(self.conv1(x), relu=False)
        if self.use_se:
            out = self.se_module(out)
        out = out * torch.sigmoid(out)               # swish
        out = self.conv3(out, relu=False)
        sc = self.downsample(x, relu=False) if self.down else x
        return torch.relu(out + sc)


class TX3D(tnn.Module):
    def __init__(self, cfg, num_classes):
        super().__init__()
        c0 = cfg.stage_channels[0]
        self.backbone = tnn.Module()
        bb = self.backbone
        bb.conv1_s = tnn.Module()
        bb.conv1_s.conv = tnn.Conv3d(3, c0, (1, 3, 3), (1, 2, 2),
                                     (0, 1, 1), bias=False)
        bb.conv1_t = TConvModule(c0, c0, (5, 1, 1), 1, (2, 0, 0))
        bb.conv1_t.conv = tnn.Conv3d(c0, c0, (5, 1, 1), 1, (2, 0, 0),
                                     groups=c0, bias=False)
        cin = c0
        for i, (blocks, ch) in enumerate(zip(cfg.stage_blocks,
                                             cfg.stage_channels)):
            inner = int(ch * cfg.expansion)
            layers = []
            for j in range(blocks):
                use_se = (cfg.se_style == "all" or j % 2 == 0)
                layers.append(TX3DBlock(cin, ch, inner,
                                        2 if j == 0 else 1, use_se))
                cin = ch
            setattr(bb, f"layer{i+1}", tnn.Sequential(*layers))
        bb.conv5 = TConvModule(cin, cfg.feat_dim, 1, 1, 0)
        self.cls_head = tnn.Module()
        # every shipped mmaction x3d config sets fc1_bias=False
        # (x3d_head.py:31) — the replica must match the REAL key set so
        # the importer's missing-fc1.bias path is what gets tested
        self.cls_head.fc1 = tnn.Linear(cfg.feat_dim, 32, bias=False)
        self.cls_head.fc2 = tnn.Linear(32, num_classes)

    def forward(self, x):
        bb = self.backbone
        x = bb.conv1_t(bb.conv1_s.conv(x))
        for i in range(4):
            x = getattr(bb, f"layer{i+1}")(x)
        x = bb.conv5(x)
        x = x.mean(dim=(2, 3, 4))
        return self.cls_head.fc2(torch.relu(self.cls_head.fc1(x)))


@pytest.mark.full    # full lane: importer parity; X3D behavior stays default (recognizers/caption consumers)
def test_x3d_conversion_parity():
    cfg = X3DConfig(stage_blocks=(1, 2, 1, 1),
                    stage_channels=(8, 16, 24, 32), expansion=2.25,
                    feat_dim=48)
    tmodel = TX3D(cfg, num_classes=5).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    sd = dict(tmodel.state_dict())

    x = np.random.default_rng(6).standard_normal(
        (2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

    variables = convert_x3d(sd, cfg)
    model = X3DClassifier(X3D(cfg), num_classes=5, mid_channels=32,
                          dropout_ratio=0.0)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
