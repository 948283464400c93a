"""ResNet3D (SlowOnly) mmaction-checkpoint importer parity
(convert/torch_import.convert_resnet3d) against a torch replica of
MCT/mmaction/models/backbones/resnet3d.py (SlowOnly pathway:
with_pool2=False, resnet3d_slowonly.py:37)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import (
    convert_resnet3d)
from cross_modal_video_engine_tpu.models.recognizer import (
    BackboneClassifier)
from cross_modal_video_engine_tpu.models.resnet3d import (ResNet3D,
                                                          ResNet3DConfig)

torch.manual_seed(0)


class TConvModule(tnn.Module):
    def __init__(self, cin, cout, k, s, p):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, k, stride=s, padding=p,
                               bias=False)
        self.bn = tnn.BatchNorm3d(cout)

    def forward(self, x, relu=True):
        x = self.bn(self.conv(x))
        return torch.relu(x) if relu else x


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride, tk):
        super().__init__()
        self.conv1 = TConvModule(cin, planes, (tk, 1, 1), 1,
                                 (tk // 2, 0, 0))
        self.conv2 = TConvModule(planes, planes, (1, 3, 3),
                                 (1, stride, stride), (0, 1, 1))
        self.conv3 = TConvModule(planes, planes * 4, 1, 1, 0)
        self.down = (stride != 1 or cin != planes * 4)
        if self.down:
            self.downsample = TConvModule(cin, planes * 4, 1,
                                          (1, stride, stride), 0)

    def forward(self, x):
        out = self.conv3(self.conv2(self.conv1(x)), relu=False)
        sc = self.downsample(x, relu=False) if self.down else x
        return torch.relu(out + sc)


class TSlowOnly(tnn.Module):
    def __init__(self, cfg, num_classes):
        super().__init__()
        c0 = cfg.base_channels
        kt = cfg.conv1_kernel_t
        self.conv1 = TConvModule(3, c0, (kt, 7, 7),
                                 (cfg.conv1_stride_t, 2, 2),
                                 (kt // 2, 3, 3))
        self.pool = tnn.MaxPool3d((1, 3, 3), (cfg.pool1_stride_t, 2, 2),
                                  (0, 1, 1))
        cin, planes = c0, c0
        for i, (blocks, tk) in enumerate(zip(cfg.stage_blocks,
                                             cfg.stage_temporal_kernels)):
            stride = 1 if i == 0 else 2
            layers = [TBottleneck(cin, planes, stride, tk)]
            cin = planes * 4
            for _ in range(1, blocks):
                layers.append(TBottleneck(cin, planes, 1, tk))
            setattr(self, f"layer{i+1}", tnn.Sequential(*layers))
            planes *= 2
        self.head_dim = cin

    def forward(self, x):
        x = self.pool(self.conv1(x))
        for i in range(4):
            x = getattr(self, f"layer{i+1}")(x)
        return x.mean(dim=(2, 3, 4))


class TWrapper(tnn.Module):
    def __init__(self, cfg, num_classes):
        super().__init__()
        self.backbone = TSlowOnly(cfg, num_classes)
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(self.backbone.head_dim,
                                          num_classes)

    def forward(self, x):
        return self.cls_head.fc_cls(self.backbone(x))


def _randomize_bn_stats(model):
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("with_head", [True, False])
def test_resnet3d_conversion_parity(with_head):
    cfg = ResNet3DConfig(stage_blocks=(1, 1, 1, 1), base_channels=8,
                         stage_temporal_kernels=(1, 1, 3, 3))
    num_classes = 5
    tmodel = TWrapper(cfg, num_classes).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    sd = dict(tmodel.state_dict())

    x = np.random.default_rng(3).standard_normal(
        (2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_in = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        want_feat = tmodel.backbone(t_in).numpy()
        want_scores = tmodel(t_in).numpy()

    if with_head:
        variables = convert_resnet3d(sd, cfg)
        model = BackboneClassifier(ResNet3D(cfg), num_classes=num_classes,
                                   dropout_ratio=0.0)
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want_scores, rtol=2e-3, atol=2e-3)
    else:
        variables = convert_resnet3d(sd, cfg, cls_head_key=None)
        model = ResNet3D(cfg)
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want_feat, rtol=2e-3, atol=2e-3)


class TNonLocal3d(tnn.Module):
    """mmcv NonLocal3d replica: embedded_gaussian, sub_sample=True,
    use_scale=True, BN on conv_out (the slowonly_r50_nl
    non_local_cfg).  Key grammar matches mmcv: g/phi wrapped in
    Sequential with the maxpool (-> g.0.conv...), theta and conv_out
    plain ConvModules."""

    def __init__(self, C):
        super().__init__()
        inter = C // 2
        self.inter = inter

        def conv_module(cin, cout, with_bn=False):
            m = tnn.Module()
            m.conv = tnn.Conv3d(cin, cout, 1, bias=not with_bn)
            if with_bn:
                m.bn = tnn.BatchNorm3d(cout)
            return m

        g = conv_module(C, inter)
        phi = conv_module(C, inter)
        pool = tnn.MaxPool3d((1, 2, 2))
        self.g = tnn.Sequential(g, pool)
        self.phi = tnn.Sequential(phi, pool)
        self.theta = conv_module(C, inter)
        self.conv_out = conv_module(inter, C, with_bn=True)

    def forward(self, x):
        B, C = x.shape[0], x.shape[1]
        g_x = self.g[1](self.g[0].conv(x)).flatten(2)        # (B, I, K)
        phi_x = self.phi[1](self.phi[0].conv(x)).flatten(2)
        theta_x = self.theta.conv(x).flatten(2)              # (B, I, Q)
        attn = torch.einsum("biq,bik->bqk", theta_x, phi_x)
        attn = torch.softmax(attn / self.inter ** 0.5, dim=-1)
        y = torch.einsum("bqk,bik->biq", attn, g_x)
        y = y.reshape(B, self.inter, *x.shape[2:])
        return x + self.conv_out.bn(self.conv_out.conv(y))


def test_non_local3d_import_parity():
    """_non_local3d + NonLocal3DBlock vs the mmcv-grammar torch replica
    (the *_nl detection/recognition checkpoints carry these blocks; the
    importer used to drop them silently)."""
    from cross_modal_video_engine_tpu.convert.torch_import import (
        _non_local3d)
    from cross_modal_video_engine_tpu.models.resnet3d import (
        NonLocal3DBlock)

    C = 8
    t = TNonLocal3d(C).eval()
    with torch.no_grad():
        t.conv_out.conv.weight.normal_(0, 0.2)  # zero-init in mmcv; vary
        t.conv_out.bn.running_mean.normal_(0, 0.1)
        t.conv_out.bn.running_var.uniform_(0.5, 1.5)
    sd = {f"non_local_block.{k}": v for k, v in t.state_dict().items()}
    params, stats = _non_local3d(sd, "non_local_block.")

    x = np.random.default_rng(3).standard_normal(
        (2, 4, 8, 8, C)).astype(np.float32)
    got = np.asarray(NonLocal3DBlock().apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)))
    with torch.no_grad():
        want = t(torch.from_numpy(
            x.transpose(0, 4, 1, 2, 3))).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
