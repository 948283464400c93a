"""Exact TIN importer parity (models/tin_mobilenet.TINResNetExact +
convert_tin) against a torch replica of resnet_tin.py: OffsetNet /
WeightNet / linear_sampler over tin_shift, CombineNet-wrapped conv1."""

import pytest
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_tin
from cross_modal_video_engine_tpu.models.heads import TSNHead
from cross_modal_video_engine_tpu.models.recognizer import Recognizer2D
from cross_modal_video_engine_tpu.models.tin_mobilenet import (
    TINExactConfig, TINResNetExact)

torch.manual_seed(5)


def t_tin_shift(data, shift):
    """torch replica of mmcv tin_shift (tin_shift_cuda_kernel.cuh:
    ``data_id = i - t_shift``): data (N, T, C, HW), shift (N, G) ints;
    out[n, t, c] = data[n, t - shift[n, g_c], c] or 0."""
    N, T, C, HW = data.shape
    G = shift.shape[1]
    gsize = C // G
    out = torch.zeros_like(data)
    for n in range(N):
        for g in range(G):
            s = int(shift[n, g])
            cs = slice(g * gsize, (g + 1) * gsize)
            for t in range(T):
                ts = t - s
                if 0 <= ts < T:
                    out[n, t, cs] = data[n, ts, cs]
    return out


def test_tin_shift_direction_golden():
    """Direct golden of the kernel semantics (not via the replica):
    tin_shift_cuda_kernel.cuh does ``data_id = i - t_shift`` so a
    shift of +1 delays the signal — out[:, 0] is zero-padded and
    out[:, t] == in[:, t-1]."""
    from cross_modal_video_engine_tpu.models.tin_mobilenet import tin_shift
    data = jnp.arange(1.0, 5.0).reshape(1, 4, 1, 1)       # frames 1..4
    out = tin_shift(data, jnp.array([[1]]))
    np.testing.assert_allclose(
        np.asarray(out).ravel(), [0.0, 1.0, 2.0, 3.0])
    out_neg = tin_shift(data, jnp.array([[-1]]))
    np.testing.assert_allclose(
        np.asarray(out_neg).ravel(), [2.0, 3.0, 4.0, 0.0])


def t_linear_sampler(data, offset):
    n, t, c, h, w = data.shape
    off0 = torch.floor(offset).int()
    flat = data.reshape(n, t, c, h * w)
    d0 = t_tin_shift(flat, off0)
    d1 = t_tin_shift(flat, off0 + 1)
    w0 = 1 - (offset - torch.floor(offset))
    gsize = c // offset.shape[1]
    w0c = w0.repeat_interleave(gsize, dim=1)[:, None, :, None]
    out = w0c * d0 + (1 - w0c) * d1
    return out.view(n, t, c, h, w)


class TOffsetNet(tnn.Module):
    def __init__(self, cin, groups, T):
        super().__init__()
        self.conv = tnn.Conv1d(cin, 1, 3, padding=1)
        self.fc1 = tnn.Linear(T, T)
        self.fc2 = tnn.Linear(T, groups)

    def forward(self, x):                       # (N, C', T)
        n, _, t = x.shape
        h = self.conv(x).view(n, t)
        h = self.fc2(torch.relu(self.fc1(h)))
        return 4 * (torch.sigmoid(h) - 0.5)     # (N, G)


class TWeightNet(tnn.Module):
    def __init__(self, cin, groups):
        super().__init__()
        self.groups = groups
        self.conv = tnn.Conv1d(cin, groups, 3, padding=1)

    def forward(self, x):
        n, _, t = x.shape
        h = self.conv(x).view(n, self.groups, t).permute(0, 2, 1)
        return 2 * torch.sigmoid(h)             # (N, T, G)


class TInterlace(tnn.Module):
    def __init__(self, cin, T, shift_div):
        super().__init__()
        self.T, self.shift_div = T, shift_div
        self.offset_net = TOffsetNet(cin // shift_div, 2, T)
        self.weight_net = TWeightNet(cin // shift_div, 2)

    def forward(self, x):                       # (B*T, C, H, W)
        n, c, h, w = x.shape
        nb, T = n // self.T, self.T
        folds = c // self.shift_div
        desc = x[:, :folds].view(nb, T, folds, h, w)
        pooled = desc.mean(dim=(3, 4)).permute(0, 2, 1)   # (nb, F, T)
        off = self.offset_net(pooled).view(nb, -1)
        wgt = self.weight_net(pooled)                     # (nb, T, 2)
        off4 = torch.cat([off, -off], dim=1)
        shifted = t_linear_sampler(desc, off4)
        q = folds // 2 // 2
        wchan = wgt[:, :, :, None].repeat(1, 1, 2, q).view(nb, T, -1)
        shifted = shifted * wchan[:, :, :, None, None]
        out = x.clone()
        out[:, :folds] = shifted.reshape(n, folds, h, w)
        return out


class TTINBlock(tnn.Module):
    def __init__(self, cin, planes, stride, T, shift_div):
        super().__init__()
        self.interlace = TInterlace(cin, T, shift_div)
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.down = stride != 1 or cin != planes * 4
        if self.down:
            self.dconv = tnn.Conv2d(cin, planes * 4, 1, stride, bias=False)
            self.dbn = tnn.BatchNorm2d(planes * 4)

    def forward(self, x):
        h = self.interlace(x)
        out = torch.relu(self.bn1(self.conv1(h)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.dbn(self.dconv(x)) if self.down else x
        return torch.relu(out + sc)

    def mmaction_sd(self, prefix):
        """Emit this block's weights in the resnet_tin.py key grammar."""
        sd = {}
        n1 = prefix + "conv1.conv.net1."
        for k, v in self.interlace.state_dict().items():
            sd[n1 + k] = v
        sd[prefix + "conv1.conv.net2.weight"] = self.conv1.weight
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[prefix + "conv1.bn." + k] = getattr(self.bn1, k)
        sd[prefix + "conv2.conv.weight"] = self.conv2.weight
        sd[prefix + "conv3.conv.weight"] = self.conv3.weight
        for bn, name in ((self.bn2, "conv2.bn."), (self.bn3, "conv3.bn.")):
            for k in ("weight", "bias", "running_mean", "running_var"):
                sd[prefix + name + k] = getattr(bn, k)
        if self.down:
            sd[prefix + "downsample.conv.weight"] = self.dconv.weight
            for k in ("weight", "bias", "running_mean", "running_var"):
                sd[prefix + "downsample.bn." + k] = getattr(self.dbn, k)
        return sd


class TTIN(tnn.Module):
    def __init__(self, cfg, num_classes):
        super().__init__()
        c0 = cfg.base_channels
        self.conv1 = tnn.Conv2d(3, c0, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(c0)
        self.pool = tnn.MaxPool2d(3, 2, 1)
        self.stages = tnn.ModuleList()
        cin, planes = c0, c0
        self.layout = []
        for i, blocks in enumerate(cfg.stage_blocks):
            for j in range(blocks):
                stride = (1 if i == 0 else 2) if j == 0 else 1
                self.stages.append(TTINBlock(cin, planes, stride,
                                             cfg.num_segments,
                                             cfg.shift_div))
                self.layout.append((i + 1, j))
                cin = planes * 4
            planes *= 2
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):                       # (B, T, C, H, W)
        B, T = x.shape[:2]
        x = x.flatten(0, 1)
        x = self.pool(torch.relu(self.bn1(self.conv1(x))))
        for blk in self.stages:
            x = blk(x)
        x = x.mean(dim=(2, 3)).view(B, T, -1).mean(dim=1)
        return self.fc(x)

    def mmaction_sd(self):
        sd = {"backbone.conv1.conv.weight": self.conv1.weight}
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd["backbone.conv1.bn." + k] = getattr(self.bn1, k)
        for blk, (i, j) in zip(self.stages, self.layout):
            sd.update(blk.mmaction_sd(f"backbone.layer{i}.{j}."))
        sd["cls_head.fc_cls.weight"] = self.fc.weight
        sd["cls_head.fc_cls.bias"] = self.fc.bias
        return sd


@pytest.mark.full    # full lane: slowest importer parity; TIN behavior stays default in test_tin_mobilenet_bsn
def test_tin_conversion_parity():
    cfg = TINExactConfig(stage_blocks=(1, 1, 1, 1), base_channels=16,
                         num_segments=4, shift_div=4)
    tmodel = TTIN(cfg, num_classes=5).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = {k: v.detach().clone() for k, v in tmodel.mmaction_sd().items()}

    x = np.random.default_rng(11).standard_normal(
        (2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3))).numpy()

    variables = convert_tin(sd, cfg)
    model = Recognizer2D(TINResNetExact(cfg), TSNHead(5, dropout_ratio=0.0))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
