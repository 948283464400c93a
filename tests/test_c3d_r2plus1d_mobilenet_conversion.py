"""Checkpoint-importer parity for C3D, R(2+1)D and MobileNetV2-TSM
(convert_c3d / convert_r2plus1d / convert_mobilenetv2_tsm) against torch
replicas of the mmaction structures (backbones/c3d.py,
resnet2plus1d.py + common/conv2plus1d.py, mobilenet_v2{,_tsm}.py)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import (
    convert_c3d, convert_mobilenetv2_tsm, convert_r2plus1d)
from cross_modal_video_engine_tpu.models.backbones2d import (
    C3D, R2Plus1D, R2Plus1DConfig, conv2plus1d_mid)
from cross_modal_video_engine_tpu.models.recognizer import BackboneClassifier
from cross_modal_video_engine_tpu.models.tin_mobilenet import (
    MobileNetV2TSM, MobileNetV2TSMConfig)

torch.manual_seed(11)


def _rand_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)


# ---------------------------------------------------------------------------
# C3D
# ---------------------------------------------------------------------------

class TC3D(tnn.Module):
    """c3d.py:64-106 replica (norm_cfg=None: biased convs, no BN)."""

    def __init__(self, fc_dim, num_classes, fc_in):
        super().__init__()
        bb = tnn.Module()
        chans = [(3, 64, "conv1a"), (64, 128, "conv2a"),
                 (128, 256, "conv3a"), (256, 256, "conv3b"),
                 (256, 512, "conv4a"), (512, 512, "conv4b"),
                 (512, 512, "conv5a"), (512, 512, "conv5b")]
        for cin, cout, name in chans:
            m = tnn.Module()
            m.conv = tnn.Conv3d(cin, cout, 3, padding=1)
            setattr(bb, name, m)
        bb.fc6 = tnn.Linear(fc_in, fc_dim)
        bb.fc7 = tnn.Linear(fc_dim, fc_dim)
        self.backbone = bb
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(fc_dim, num_classes)

    def forward(self, x):                      # (B, 3, T, H, W)
        bb = self.backbone
        r = torch.relu
        x = r(bb.conv1a.conv(x))
        x = F.max_pool3d(x, (1, 2, 2), (1, 2, 2))
        x = r(bb.conv2a.conv(x))
        x = F.max_pool3d(x, 2, 2)
        x = r(bb.conv3b.conv(r(bb.conv3a.conv(x))))
        x = F.max_pool3d(x, 2, 2)
        x = r(bb.conv4b.conv(r(bb.conv4a.conv(x))))
        x = F.max_pool3d(x, 2, 2)
        x = r(bb.conv5b.conv(r(bb.conv5a.conv(x))))
        x = F.max_pool3d(x, 2, 2, padding=(0, 1, 1))
        x = x.flatten(1)                       # channel-first flatten
        x = r(bb.fc6(x))
        x = r(bb.fc7(x))
        return self.cls_head.fc_cls(x)


def test_c3d_conversion_parity():
    # 16x64x64 input -> pool5 map (512, 1, 3, 3) -> fc_in 4608
    fc_dim, ncls = 64, 5
    tmodel = TC3D(fc_dim, ncls, fc_in=512 * 1 * 3 * 3).eval()
    sd = dict(tmodel.state_dict())
    x = np.random.default_rng(1).standard_normal(
        (1, 16, 64, 64, 3)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 4, 1, 2, 3))).numpy()

    variables = convert_c3d(sd)

    import flax.linen as nn

    class _C3DCls(nn.Module):
        @nn.compact
        def __call__(self, v, *, train=False):
            feat = C3D(fc_dim=fc_dim, exact_head=True,
                       name="backbone")(v, train=train)
            return nn.Dense(ncls, name="fc_cls")(feat)

    # rewrap the head params under the module's name
    params = {"backbone": variables["params"]["backbone"],
              "fc_cls": variables["params"]["cls_head"]["fc_cls"]}
    got = np.asarray(_C3DCls().apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# R(2+1)D
# ---------------------------------------------------------------------------

class TConv2Plus1d(tnn.Module):
    """common/conv2plus1d.py replica."""

    def __init__(self, cin, cout, k, stride):
        super().__init__()
        kt, kh, kw = k
        mid = conv2plus1d_mid(cin, cout, kt, kh, kw)
        self.conv_s = tnn.Conv3d(cin, mid, (1, kh, kw),
                                 (1, stride[1], stride[2]),
                                 (0, kh // 2, kw // 2), bias=False)
        self.bn_s = tnn.BatchNorm3d(mid)
        self.conv_t = tnn.Conv3d(mid, cout, (kt, 1, 1), (stride[0], 1, 1),
                                 (kt // 2, 0, 0), bias=False)

    def forward(self, x):
        return self.conv_t(torch.relu(self.bn_s(self.conv_s(x))))


class TConvModule2p1(tnn.Module):
    def __init__(self, cin, cout, k, stride, act=True):
        super().__init__()
        self.conv = TConv2Plus1d(cin, cout, k, stride)
        self.bn = tnn.BatchNorm3d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.act else x


class TBasicBlock2p1(tnn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
        self.conv1 = TConvModule2p1(cin, planes, (3, 3, 3),
                                    (stride,) * 3)
        self.conv2 = TConvModule2p1(planes, planes, (3, 3, 3),
                                    (1, 1, 1), act=False)
        self.need_down = stride != 1 or cin != planes
        if self.need_down:
            self.downsample = TConvModule2p1(cin, planes, (1, 1, 1),
                                             (stride,) * 3, act=False)

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        sc = self.downsample(x) if self.need_down else x
        return torch.relu(out + sc)


class TR2Plus1D(tnn.Module):
    def __init__(self, cfg, num_classes):
        super().__init__()
        bb = tnn.Module()
        bb.conv1 = TConvModule2p1(3, cfg.base_channels, (3, 7, 7),
                                  (1, 2, 2))
        cin, planes = cfg.base_channels, cfg.base_channels
        for i, blocks in enumerate(cfg.stage_blocks):
            stride = 1 if i == 0 else 2
            layers = [TBasicBlock2p1(cin, planes, stride)]
            cin = planes
            for _ in range(1, blocks):
                layers.append(TBasicBlock2p1(cin, planes, 1))
            setattr(bb, f"layer{i+1}", tnn.Sequential(*layers))
            planes *= 2
        self.backbone = bb
        self.n_stages = len(cfg.stage_blocks)
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(cin, num_classes)

    def forward(self, x):                      # (B, 3, T, H, W)
        bb = self.backbone
        x = bb.conv1(x)
        x = F.max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        for i in range(self.n_stages):
            x = getattr(bb, f"layer{i+1}")(x)
        x = x.mean(dim=(2, 3, 4))
        return self.cls_head.fc_cls(x)


def test_r2plus1d_conversion_parity():
    cfg = R2Plus1DConfig(stage_blocks=(1, 1), base_channels=8)
    tmodel = TR2Plus1D(cfg, num_classes=4).eval()
    _rand_bn(tmodel)
    sd = dict(tmodel.state_dict())
    x = np.random.default_rng(2).standard_normal(
        (2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 4, 1, 2, 3))).numpy()

    variables = convert_r2plus1d(sd, cfg)
    model = BackboneClassifier(R2Plus1D(cfg), num_classes=4,
                               dropout_ratio=0.0)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# MobileNetV2-TSM
# ---------------------------------------------------------------------------

def tshift(x, T, div=8):
    bt, c, h, w = x.shape
    x = x.view(bt // T, T, c, h, w)
    fold = c // div
    out = torch.zeros_like(x)
    out[:, :-1, :fold] = x[:, 1:, :fold]
    out[:, 1:, fold:2 * fold] = x[:, :-1, fold:2 * fold]
    out[:, :, 2 * fold:] = x[:, :, 2 * fold:]
    return out.view(bt, c, h, w)


class TConvBNReLU6(tnn.Module):
    def __init__(self, cin, cout, k=1, stride=1, groups=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2,
                               groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu6(x) if self.act else x


class TShiftWrap(tnn.Module):
    def __init__(self, net, T, div):
        super().__init__()
        self.net = net
        self.T, self.div = T, div

    def forward(self, x):
        return self.net(tshift(x, self.T, self.div))


class TInvRes(tnn.Module):
    def __init__(self, cin, cout, stride, expand, T, div):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        mods = []
        if expand != 1:
            mods.append(TConvBNReLU6(cin, hidden))
        mods.append(TConvBNReLU6(hidden, hidden, 3, stride, groups=hidden))
        mods.append(TConvBNReLU6(hidden, cout, act=False))
        # mobilenet_v2_tsm.py:25-34 wraps conv[0] on residual 3-mod blocks
        if self.use_res and len(mods) == 3:
            mods[0] = TShiftWrap(mods[0], T, div)
        self.conv = tnn.Sequential(*mods)

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


class TMobileNetV2TSM(tnn.Module):
    def __init__(self, cfg, T, num_classes):
        super().__init__()
        bb = tnn.Module()
        bb.conv1 = TConvBNReLU6(3, 32, 3, 2)
        cin = 32
        for si, (e, c, n, s) in enumerate(cfg.stages):
            layers = []
            for j in range(n):
                layers.append(TInvRes(cin, c, s if j == 0 else 1, e, T,
                                      cfg.shift_div))
                cin = c
            setattr(bb, f"layer{si+1}", tnn.Sequential(*layers))
        bb.conv2 = TConvBNReLU6(cin, cfg.last_channels)
        self.backbone = bb
        self.n_stages = len(cfg.stages)
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(cfg.last_channels, num_classes)

    def forward(self, x):                      # (B, T, C, H, W)
        B, T = x.shape[:2]
        x = x.flatten(0, 1)
        bb = self.backbone
        x = bb.conv1(x)
        for i in range(self.n_stages):
            x = getattr(bb, f"layer{i+1}")(x)
        x = bb.conv2(x)
        x = x.mean(dim=(2, 3)).view(B, T, -1).mean(dim=1)
        return self.cls_head.fc_cls(x)


def test_mobilenetv2_tsm_conversion_parity():
    cfg = MobileNetV2TSMConfig(
        stages=((1, 8, 1, 1), (6, 16, 2, 2), (6, 24, 2, 2)),
        last_channels=64, shift_div=8)
    T = 4
    tmodel = TMobileNetV2TSM(cfg, T, num_classes=5).eval()
    _rand_bn(tmodel)
    sd = dict(tmodel.state_dict())
    x = np.random.default_rng(3).standard_normal(
        (2, T, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3))).numpy()

    variables = convert_mobilenetv2_tsm(sd, cfg)
    from cross_modal_video_engine_tpu.models.heads import TSNHead
    from cross_modal_video_engine_tpu.models.recognizer import Recognizer2D
    model = Recognizer2D(MobileNetV2TSM(cfg),
                         TSNHead(5, dropout_ratio=0.0))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
