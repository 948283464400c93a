"""Audio-family checkpoint import: the reference's shipped audio
recipes use a PLAIN mmaction 2D ResNet over 1-channel spectrograms
(configs/_base_/models/tsn_r50_audio.py: backbone type='ResNet',
in_channels=1 + AudioTSNHead), which imports through convert_tsm's
ConvModule grammar with the parameter-free shift disabled
(shift_div large -> fold 0)."""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_tsm
from cross_modal_video_engine_tpu.models.backbones2d import (TSMConfig,
                                                             TSMResNet)
from cross_modal_video_engine_tpu.models.heads import TSNHead
from cross_modal_video_engine_tpu.models.recognizer import Recognizer2D

torch.manual_seed(41)


class TBlock(tnn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
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
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.downsample(x) if self.down else x
        return torch.relu(out + sc)


class TAudioResNet(tnn.Module):
    """Plain torchvision-grammar ResNet, in_channels=1 (the audio
    spectrogram backbone) + AudioTSNHead (avg pool + fc)."""

    def __init__(self, cfg, num_classes):
        super().__init__()
        bb = tnn.Module()
        c0 = cfg.base_channels
        bb.conv1 = tnn.Conv2d(1, c0, 7, 2, 3, bias=False)
        bb.bn1 = tnn.BatchNorm2d(c0)
        cin, planes = c0, c0
        for i, blocks in enumerate(cfg.stage_blocks):
            stride = 1 if i == 0 else 2
            layers = [TBlock(cin, planes, stride)]
            cin = planes * 4
            for _ in range(1, blocks):
                layers.append(TBlock(cin, planes, 1))
            setattr(bb, f"layer{i+1}", tnn.Sequential(*layers))
            planes *= 2
        self.backbone = bb
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(cin, num_classes)

    def forward(self, spec):           # (B, 1, T, F)
        bb = self.backbone
        x = torch.nn.functional.max_pool2d(
            torch.relu(bb.bn1(bb.conv1(spec))), 3, 2, 1)
        for i in range(4):
            x = getattr(bb, f"layer{i+1}")(x)
        x = x.mean(dim=(2, 3))
        return self.cls_head.fc_cls(x)


def test_audio_resnet_import_parity():
    cfg = TSMConfig(stage_blocks=(1, 1, 1, 1), base_channels=8,
                    shift_div=10 ** 9)    # fold 0 -> shift is a no-op
    tmodel = TAudioResNet(cfg, num_classes=5).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = dict(tmodel.state_dict())

    spec = np.random.default_rng(12).standard_normal(
        (2, 64, 40)).astype(np.float32)       # (B, T, mel)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(spec[:, None])).numpy()

    variables = convert_tsm(sd, cfg)
    model = Recognizer2D(TSMResNet(cfg), TSNHead(5, dropout_ratio=0.0))
    # one 'frame' whose image is the (T, mel) spectrogram, 1 channel
    x = jnp.asarray(spec[:, None, :, :, None])
    got = np.asarray(model.apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
