"""SlowFast mmaction-checkpoint importer parity
(convert/torch_import.convert_slowfast) against a torch replica of
resnet3d_slowfast.py (two pathways, conv1_lateral + layer{1..3}_lateral
time-strided fusion, head concat (slow, fast))."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import (
    convert_slowfast)
from cross_modal_video_engine_tpu.models.recognizer import (
    BackboneClassifier)
from cross_modal_video_engine_tpu.models.resnet3d import (SlowFast,
                                                          SlowFastConfig)
from tests.test_resnet3d_conversion import (TBottleneck, TConvModule,
                                            _randomize_bn_stats)

torch.manual_seed(1)


class TPathway(tnn.Module):
    """Either pathway: stem + 4 bottleneck stages (mmaction ResNet3dPathway
    without laterals; laterals live on the slow side)."""

    def __init__(self, c0, conv1_kt, tks, blocks, extra_in=None):
        super().__init__()
        self.conv1 = TConvModule(3, c0, (conv1_kt, 7, 7), (1, 2, 2),
                                 (conv1_kt // 2, 3, 3))
        self.pool = tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        cin, planes = c0, c0
        self.stage_in = []
        for i, (nb, tk) in enumerate(zip(blocks, tks)):
            if extra_in is not None:
                cin += extra_in[i]
            self.stage_in.append(cin)
            stride = 1 if i == 0 else 2
            layers = [TBottleneck(cin, planes, stride, tk)]
            cin = planes * 4
            for _ in range(1, nb):
                layers.append(TBottleneck(cin, planes, 1, tk))
            setattr(self, f"layer{i+1}", tnn.Sequential(*layers))
            planes *= 2
        self.out_dim = cin

    def stem(self, x):
        return self.pool(self.conv1(x))


class TSlowFast(tnn.Module):
    def __init__(self, cfg, num_classes):
        super().__init__()
        c0 = cfg.base_channels
        cf = c0 // cfg.beta_inv
        fast_chans = [cf, cf * 4, cf * 8, cf * 16]   # stem, s1, s2, s3
        laterals_out = [2 * c for c in fast_chans]
        self.backbone = tnn.Module()
        self.backbone.fast_path = TPathway(cf, 5, (3, 3, 3, 3),
                                           cfg.depth_blocks)
        self.backbone.slow_path = TPathway(c0, 1, (1, 1, 3, 3),
                                           cfg.depth_blocks,
                                           extra_in=laterals_out)
        sp = self.backbone.slow_path
        lk = cfg.lateral_kernel_t

        def lateral(cin, cout):
            lat = tnn.Module()
            lat.conv = tnn.Conv3d(cin, cout, (lk, 1, 1),
                                  stride=(cfg.alpha, 1, 1),
                                  padding=(lk // 2, 0, 0), bias=False)
            if cfg.lateral_norm:
                lat.bn = tnn.BatchNorm3d(cout)
            return lat

        sp.conv1_lateral = lateral(fast_chans[0], laterals_out[0])
        for i in (1, 2, 3):
            setattr(sp, f"layer{i}_lateral",
                    lateral(fast_chans[i], laterals_out[i]))
        self.cls_head = tnn.Module()
        self.cls_head.fc_cls = tnn.Linear(sp.out_dim
                                          + self.backbone.fast_path.out_dim,
                                          num_classes)
        self.alpha = cfg.alpha

    def _lateral(self, mod, x):
        y = mod.conv(x)
        if hasattr(mod, "bn"):
            y = torch.relu(mod.bn(y))    # ConvModule BN+ReLU when
        return y                          # lateral_norm=True

    def forward(self, x):
        x_slow = self.backbone.slow_path.stem(x[:, :, ::self.alpha])
        x_fast = self.backbone.fast_path.stem(x)
        sp, fp = self.backbone.slow_path, self.backbone.fast_path
        x_slow = torch.cat(
            [x_slow, self._lateral(sp.conv1_lateral, x_fast)], dim=1)
        for i in range(4):
            x_slow = getattr(sp, f"layer{i+1}")(x_slow)
            x_fast = getattr(fp, f"layer{i+1}")(x_fast)
            if i != 3:
                lat = self._lateral(getattr(sp, f"layer{i+1}_lateral"),
                                    x_fast)
                x_slow = torch.cat([x_slow, lat], dim=1)
        pooled = torch.cat([x_slow.mean(dim=(2, 3, 4)),
                            x_fast.mean(dim=(2, 3, 4))], dim=1)
        return self.cls_head.fc_cls(pooled)


@pytest.mark.parametrize("lateral_norm", [False, True])
def test_slowfast_conversion_parity(lateral_norm):
    cfg = SlowFastConfig(depth_blocks=(1, 1, 1, 1), alpha=4, beta_inv=8,
                         base_channels=16, lateral_kernel_t=5,
                         lateral_norm=lateral_norm)
    tmodel = TSlowFast(cfg, num_classes=4).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    sd = dict(tmodel.state_dict())

    x = np.random.default_rng(5).standard_normal(
        (2, 8, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

    variables = convert_slowfast(sd, cfg)
    model = BackboneClassifier(SlowFast(cfg), num_classes=4,
                               dropout_ratio=0.0)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
