"""TANet checkpoint-importer parity (convert_tanet) against a torch
replica of mmaction's structure: Bottleneck wrapped by TABlock with TAM
(adaptive global temporal kernel + local sigmoid gate) after conv1
(backbones/tanet.py + common/tam.py)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_tanet
from cross_modal_video_engine_tpu.models.heads import TSNHead
from cross_modal_video_engine_tpu.models.recognizer import Recognizer2D
from cross_modal_video_engine_tpu.models.tanet import TANet, TANetConfig
import pytest

torch.manual_seed(27)


class TTAM(tnn.Module):
    """common/tam.py:34-122 replica."""

    def __init__(self, cin, T, alpha=2, K=3, beta=4, ck=3):
        super().__init__()
        self.T, self.K = T, K
        self.G = tnn.Sequential(
            tnn.Linear(T, T * alpha, bias=False),
            tnn.BatchNorm1d(T * alpha), tnn.ReLU(),
            tnn.Linear(T * alpha, K, bias=False), tnn.Softmax(-1))
        self.L = tnn.Sequential(
            tnn.Conv1d(cin, cin // beta, ck, padding=ck // 2, bias=False),
            tnn.BatchNorm1d(cin // beta), tnn.ReLU(),
            tnn.Conv1d(cin // beta, cin, 1, bias=False), tnn.Sigmoid())

    def forward(self, x):                      # (n=B*T, c, h, w)
        n, c, h, w = x.shape
        T = self.T
        nb = n // T
        x = x.view(nb, T, c, h, w).permute(0, 2, 1, 3, 4).contiguous()
        theta = F.adaptive_avg_pool2d(x.reshape(-1, T, h, w), (1, 1))
        kern = self.G(theta.view(-1, T)).view(nb * c, 1, -1, 1)
        la = self.L(theta.view(-1, c, T)).view(nb, c, T, 1, 1)
        nx = x * la
        y = F.conv2d(nx.reshape(1, nb * c, T, h * w), kern, bias=None,
                     stride=(1, 1), padding=(self.K // 2, 0),
                     groups=nb * c)
        y = y.view(nb, c, T, h, w).permute(0, 2, 1, 3, 4)
        return y.reshape(n, c, h, w)


class TConvBN(tnn.Module):
    def __init__(self, cin, cout, k=1, stride=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.act else x


class TTABlock(tnn.Module):
    def __init__(self, cin, planes, stride, T):
        super().__init__()
        block = tnn.Module()
        block.conv1 = TConvBN(cin, planes)
        block.conv2 = TConvBN(planes, planes, 3, stride)
        block.conv3 = TConvBN(planes, planes * 4, act=False)
        self.need_down = stride != 1 or cin != planes * 4
        if self.need_down:
            block.downsample = TConvBN(cin, planes * 4, 1, stride,
                                       act=False)
        self.block = block
        self.tam = TTAM(planes, T)

    def forward(self, x):
        out = self.tam(self.block.conv1(x))
        out = self.block.conv3(self.block.conv2(out))
        sc = self.block.downsample(x) if self.need_down else x
        return torch.relu(out + sc)


class TTANet(tnn.Module):
    def __init__(self, cfg, T, num_classes):
        super().__init__()
        bb = tnn.Module()
        bb.conv1 = TConvBN(3, cfg.base_channels, 7, 2)
        cin, planes = cfg.base_channels, cfg.base_channels
        for i, blocks in enumerate(cfg.stage_blocks):
            stride = 1 if i == 0 else 2
            layers = [TTABlock(cin, planes, stride, T)]
            cin = planes * 4
            for _ in range(1, blocks):
                layers.append(TTABlock(cin, planes, 1, T))
            setattr(bb, f"layer{i+1}", tnn.Sequential(*layers))
            planes *= 2
        self.backbone = bb
        self.n_stages = len(cfg.stage_blocks)
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(cin, num_classes)

    def forward(self, x):                      # (B, T, C, H, W)
        B, T = x.shape[:2]
        x = x.flatten(0, 1)
        bb = self.backbone
        x = F.max_pool2d(bb.conv1(x), 3, 2, 1)
        for i in range(self.n_stages):
            x = getattr(bb, f"layer{i+1}")(x)
        x = x.mean(dim=(2, 3)).view(B, T, -1).mean(dim=1)
        return self.cls_head.fc_cls(x)


@pytest.mark.full    # full lane: importer parity; TANet behavior stays default in test_tanet_prefetch
def test_tanet_conversion_parity():
    cfg = TANetConfig(stage_blocks=(1, 1), base_channels=8)
    T = 4
    tmodel = TTANet(cfg, T, num_classes=5).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = dict(tmodel.state_dict())

    x = np.random.default_rng(6).standard_normal(
        (2, T, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3))).numpy()

    variables = convert_tanet(sd, cfg)
    model = Recognizer2D(TANet(cfg), TSNHead(5, dropout_ratio=0.0))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
