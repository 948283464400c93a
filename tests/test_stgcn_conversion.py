"""STGCN checkpoint-importer parity (convert_stgcn) against a torch
replica of mmaction's structure: ConvTemporalGraphical (biased 1x1 conv
+ adjacency einsum), [BN, ReLU, temporal conv, BN] tcn, residual-free
block 0, conv+BN residuals, per-block edge importance, data_bn over
V*C, graph buffer A in the checkpoint, 1x1-Conv2d head."""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_stgcn
from cross_modal_video_engine_tpu.models.recognizer import BackboneClassifier
from cross_modal_video_engine_tpu.models.stgcn import (
    STGCN, build_partitioned_adjacency)

torch.manual_seed(15)


class TGraphConv(tnn.Module):
    def __init__(self, cin, cout, K):
        super().__init__()
        self.K = K
        self.conv = tnn.Conv2d(cin, cout * K, 1)

    def forward(self, x, A):                   # x (N, C, T, V)
        x = self.conv(x)
        n, kc, t, v = x.shape
        x = x.view(n, self.K, kc // self.K, t, v)
        return torch.einsum("nkctv,kvw->nctw", x, A)


class TSTGCNBlock(tnn.Module):
    def __init__(self, cin, cout, K, stride=1, residual=True):
        super().__init__()
        self.gcn = TGraphConv(cin, cout, K)
        self.tcn = tnn.Sequential(
            tnn.BatchNorm2d(cout), tnn.ReLU(),
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


class TSTGCN(tnn.Module):
    def __init__(self, A, channels, strides, cin, num_classes):
        super().__init__()
        bb = tnn.Module()
        bb.register_buffer("A", torch.from_numpy(A))
        V = A.shape[1]
        bb.data_bn = tnn.BatchNorm1d(cin * V)
        blocks = []
        prev = cin
        for i, (c, s) in enumerate(zip(channels, strides)):
            blocks.append(TSTGCNBlock(prev, c, A.shape[0], s,
                                      residual=i > 0))
            prev = c
        bb.st_gcn_networks = tnn.ModuleList(blocks)
        bb.edge_importance = tnn.ParameterList(
            [tnn.Parameter(torch.ones(A.shape)) for _ in blocks])
        self.backbone = bb
        self.cls_head = tnn.Module()
        self.cls_head.fc = tnn.Conv2d(prev, num_classes, 1)

    def forward(self, x):                      # (N, C, T, V), one person
        bb = self.backbone
        n, c, t, v = x.shape
        # data_bn: N M V C T -> (n*m, v*c, t)  (stgcn.py:262-266), M=1
        h = x.permute(0, 3, 1, 2).reshape(n, v * c, t)
        h = bb.data_bn(h)
        h = h.view(n, v, c, t).permute(0, 2, 3, 1).contiguous()
        for gcn, imp in zip(bb.st_gcn_networks, bb.edge_importance):
            h = gcn(h, bb.A * imp)
        h = h.mean(dim=(2, 3), keepdim=True)   # pool T, V
        return self.cls_head.fc(h)[:, :, 0, 0]


def test_stgcn_conversion_parity():
    V = 17
    A = build_partitioned_adjacency(V)           # (3, V, V), ours A[k,w,v]
    A_ref = np.swapaxes(A, 1, 2).copy()          # reference A[k,v,w]
    channels, strides = (8, 8, 16), (1, 1, 2)
    tmodel = TSTGCN(A_ref, channels, strides, cin=3,
                    num_classes=4).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
            if isinstance(m, tnn.Parameter):
                pass
        for pmt in tmodel.backbone.edge_importance:
            pmt.copy_(torch.rand_like(pmt) * 0.5 + 0.75)
    sd = dict(tmodel.state_dict())

    kp = np.random.default_rng(4).standard_normal(
        (2, 8, V, 3)).astype(np.float32)         # (B, T, V, C)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            kp.transpose(0, 3, 1, 2))).numpy()

    variables, cfg = convert_stgcn(sd)
    assert cfg.channels == channels
    assert cfg.temporal_strides == strides
    model = BackboneClassifier(STGCN(cfg), num_classes=4,
                               dropout_ratio=0.0)
    got = np.asarray(model.apply(variables, jnp.asarray(kp)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_stgcn_adjacency_roundtrip():
    """cfg.adjacency from the checkpoint buffer reproduces the graph the
    reference computed with (our orientation is the transpose)."""
    V = 17
    A = build_partitioned_adjacency(V)
    A_ref = np.swapaxes(A, 1, 2)
    tmodel = TSTGCN(A_ref.copy(), (4,), (1,), cin=3, num_classes=2)
    sd = dict(tmodel.state_dict())
    _vars, cfg = convert_stgcn(sd)
    np.testing.assert_allclose(np.asarray(cfg.adjacency), A, atol=1e-6)
