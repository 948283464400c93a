"""AGCN (2s-AGCN) checkpoint-importer parity (convert_agcn) against a
torch replica of mmaction backbones/agcn.py: adaptive graph conv
(A + PA + data-dependent softmax attention per subset), gcn-level down
+ 1e-6-init bn, [Conv(9,1), BN] tcn, residual-free block 0."""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_agcn
from cross_modal_video_engine_tpu.models.recognizer import BackboneClassifier
from cross_modal_video_engine_tpu.models.stgcn import (
    AGCN, build_partitioned_adjacency)

torch.manual_seed(21)


class TAdaptiveGraphConv(tnn.Module):
    """agcn.py ConvTemporalGraphical:166-236."""

    def __init__(self, cin, cout, K, V):
        super().__init__()
        self.PA = tnn.Parameter(torch.full((K, V, V), 1e-6))
        self.inter_c = cout // 4
        self.conv_a = tnn.ModuleList(
            [tnn.Conv2d(cin, self.inter_c, 1) for _ in range(K)])
        self.conv_b = tnn.ModuleList(
            [tnn.Conv2d(cin, self.inter_c, 1) for _ in range(K)])
        self.conv_d = tnn.ModuleList(
            [tnn.Conv2d(cin, cout, 1) for _ in range(K)])
        self.has_down = cin != cout
        if self.has_down:
            self.down = tnn.Sequential(tnn.Conv2d(cin, cout, 1),
                                       tnn.BatchNorm2d(cout))
        self.bn = tnn.BatchNorm2d(cout)
        self.soft = tnn.Softmax(-2)

    def forward(self, x, A0):
        N, C, T, V = x.shape
        A = A0 + self.PA
        y = None
        for i in range(len(self.conv_a)):
            A1 = self.conv_a[i](x).permute(0, 3, 1, 2).contiguous().view(
                N, V, self.inter_c * T)
            A2 = self.conv_b[i](x).view(N, self.inter_c * T, V)
            A1 = self.soft(torch.matmul(A1, A2) / A1.size(-1))
            A1 = A1 + A[i]
            A2 = x.view(N, C * T, V)
            z = self.conv_d[i](torch.matmul(A2, A1).view(N, C, T, V))
            y = z + y if y is not None else z
        y = self.bn(y)
        y = y + (self.down(x) if self.has_down else x)
        return torch.relu(y)


class TAGCNBlock(tnn.Module):
    def __init__(self, cin, cout, K, V, stride=1, residual=True):
        super().__init__()
        self.gcn = TAdaptiveGraphConv(cin, cout, K, V)
        self.tcn = tnn.Sequential(
            tnn.Conv2d(cout, cout, (9, 1), (stride, 1), (4, 0)),
            tnn.BatchNorm2d(cout))
        self.has_res = residual
        self.conv_res = residual and (cin != cout or stride != 1)
        if self.conv_res:
            self.residual = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, (stride, 1)),
                tnn.BatchNorm2d(cout))

    def forward(self, x, A):
        if not self.has_res:
            res = 0
        elif self.conv_res:
            res = self.residual(x)
        else:
            res = x
        return torch.relu(self.tcn(self.gcn(x, A)) + res)


class TAGCN(tnn.Module):
    def __init__(self, A, channels, strides, cin, num_classes):
        super().__init__()
        bb = tnn.Module()
        bb.register_buffer("A", torch.from_numpy(A))
        K, V, _ = A.shape
        bb.data_bn = tnn.BatchNorm1d(cin * V)
        blocks = []
        prev = cin
        for i, (c, s) in enumerate(zip(channels, strides)):
            blocks.append(TAGCNBlock(prev, c, K, V, s, residual=i > 0))
            prev = c
        bb.agcn_networks = tnn.ModuleList(blocks)
        self.backbone = bb
        self.cls_head = tnn.Module()
        self.cls_head.fc = tnn.Conv2d(prev, num_classes, 1)

    def forward(self, x):                      # (N, C, T, V), one person
        bb = self.backbone
        n, c, t, v = x.shape
        h = x.permute(0, 3, 1, 2).reshape(n, v * c, t)
        h = bb.data_bn(h)
        h = h.view(n, v, c, t).permute(0, 2, 3, 1).contiguous()
        for gcn in bb.agcn_networks:
            h = gcn(h, bb.A)
        h = h.mean(dim=(2, 3), keepdim=True)
        return self.cls_head.fc(h)[:, :, 0, 0]


def test_agcn_conversion_parity():
    V = 17
    A_ref = build_partitioned_adjacency(V)     # orientation used as-is
    channels, strides = (8, 8, 16), (1, 1, 2)
    tmodel = TAGCN(A_ref.copy(), channels, strides, cin=3,
                   num_classes=4).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
        for blk in tmodel.backbone.agcn_networks:
            blk.gcn.PA.copy_(torch.randn_like(blk.gcn.PA) * 0.05)
    sd = dict(tmodel.state_dict())

    kp = np.random.default_rng(5).standard_normal(
        (2, 8, V, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            kp.transpose(0, 3, 1, 2))).numpy()

    variables, cfg = convert_agcn(sd)
    assert cfg.channels == channels
    assert cfg.temporal_strides == strides
    model = BackboneClassifier(AGCN(cfg), num_classes=4,
                               dropout_ratio=0.0)
    got = np.asarray(model.apply(variables, jnp.asarray(kp)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
