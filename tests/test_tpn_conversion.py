"""TPN neck checkpoint-importer parity (convert_tpn) against a torch
replica of mmaction necks/tpn.py at the shipped tpn_slowonly recipe
shape: 2 stages, spatial modulation ladder, grouped temporal
modulation, identity upsample + conv downsample hops, two level
fusions, pyramid fusion, aux head."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import convert_tpn
from cross_modal_video_engine_tpu.models.tpn import TPN, TPNConfig

torch.manual_seed(33)


class TConvBN3d(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, groups=1,
                 norm=True, act=True):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, k, stride, padding,
                               groups=groups, bias=False)
        self.bn = tnn.BatchNorm3d(cout) if norm else None
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return torch.relu(x) if self.act else x


class TTPN(tnn.Module):
    """necks/tpn.py replica at the standard 2-stage recipe (upsample
    scale (1,1,1) identity, downsample scale (1,1,1): conv-only hop)."""

    def __init__(self, cfg, aux_classes):
        super().__init__()
        c_lo, c_hi = cfg.in_channels
        out, mid, lf_out = (cfg.out_channels, cfg.mid_channels,
                            cfg.lf_out_channels)
        g = cfg.groups

        sm = tnn.Module()
        ladder = tnn.ModuleList(
            [TConvBN3d(c_lo, c_lo * 2, (1, 3, 3), (1, 2, 2),
                       (0, 1, 1))])
        sm.spatial_modulation = tnn.ModuleList([ladder, tnn.ModuleList()])
        self.spatial_modulation = sm

        self.temporal_modulation_ops = tnn.ModuleList()
        for scale in cfg.downsample_scales:
            m = tnn.Module()
            m.conv = TConvBN3d(c_hi, out, (3, 1, 1), 1, (1, 0, 0),
                               groups=g, norm=False, act=False)
            m.pool = tnn.MaxPool3d((scale, 1, 1), (scale, 1, 1),
                                   ceil_mode=True)
            self.temporal_modulation_ops.append(m)

        ds = tnn.Module()
        ds.conv = TConvBN3d(out, out, (3, 1, 1), 1, (1, 0, 0),
                            norm=False, act=False)
        self.downsample_ops = tnn.ModuleList([ds])

        def lf():
            # mmaction DownSample nests its ConvModule under .conv
            m = tnn.Module()
            downs = tnn.ModuleList()
            for _ in range(2):
                d = tnn.Module()
                d.conv = TConvBN3d(out, mid, 1, groups=g)
                downs.append(d)
            m.downsamples = downs
            m.fusion_conv = TConvBN3d(2 * mid, lf_out, 1)
            return m

        self.level_fusion_1 = lf()
        self.level_fusion_2 = lf()
        self.pyramid_fusion = TConvBN3d(2 * lf_out, cfg.fusion_channels, 1)

        aux = tnn.Module()
        # ConvModule's default act_cfg is ReLU; the reference AuxHead
        # does not override it (tpn.py AuxHead norm_cfg=BN3d only)
        aux.conv = TConvBN3d(c_lo, c_lo * 2, (1, 3, 3), (1, 2, 2),
                             (0, 1, 1))
        aux.fc = tnn.Linear(c_lo * 2, aux_classes)
        self.aux_head = aux

    def forward(self, x):              # [(N,C,T,H,W) lo, hi]
        sm_outs = [x[0], x[1]]
        for op in self.spatial_modulation.spatial_modulation[0]:
            sm_outs[0] = op(sm_outs[0])
        tm = []
        for i, m in enumerate(self.temporal_modulation_ops):
            tm.append(m.pool(m.conv.forward(sm_outs[i])))
        outs = [t.clone() for t in tm]
        outs[0] = outs[0] + outs[1]            # identity upsample hop
        td = self.level_fusion_1.fusion_conv(torch.cat(
            [self.level_fusion_1.downsamples[i].conv(outs[i])
             for i in range(2)], 1))
        outs[1] = outs[1] + self.downsample_ops[0].conv(outs[0])
        bu = self.level_fusion_2.fusion_conv(torch.cat(
            [self.level_fusion_2.downsamples[i].conv(outs[i])
             for i in range(2)], 1))
        return self.pyramid_fusion(torch.cat([td, bu], 1))


def test_tpn_conversion_parity():
    cfg = TPNConfig(in_channels=(8, 16), out_channels=8, mid_channels=8,
                    lf_out_channels=16, fusion_channels=16,
                    downsample_scales=(2, 2), groups=4,
                    aux_num_classes=5)
    tmodel = TTPN(cfg, aux_classes=5).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = {f"neck.{k}": v for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(9)
    lo = rng.standard_normal((2, 8, 8, 8, 8)).astype(np.float32)
    hi = rng.standard_normal((2, 8, 4, 4, 16)).astype(np.float32)
    with torch.no_grad():
        want = tmodel([
            torch.from_numpy(lo.transpose(0, 4, 1, 2, 3)),
            torch.from_numpy(hi.transpose(0, 4, 1, 2, 3)),
        ]).numpy().transpose(0, 2, 3, 4, 1)     # back to channels-last

    variables = convert_tpn(sd, cfg)
    got, aux = TPN(cfg).apply(variables, [jnp.asarray(lo),
                                          jnp.asarray(hi)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                               atol=2e-3)
    assert aux == {}                            # no labels, no loss
