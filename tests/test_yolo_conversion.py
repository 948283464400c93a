"""YOLOv5 weight-conversion parity: a tiny torch model with the exact
ultralytics sequential state-dict layout (model.0 .. model.24, the format
of the pretrained yolov5s.pt the reference's detect.py loads) vs the
converted flax YoloV5."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert import (
    convert_yolov5, yolo_config_from_torch)
from cross_modal_video_engine_tpu.models.yolo import (
    YoloV5, YoloConfig, decode_predictions)

rng = np.random.default_rng(123)


class TConv(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1, p=None):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = tnn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return tF.silu(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, cin, cout, shortcut=True):
        super().__init__()
        self.cv1 = TConv(cin, cout, 1)
        self.cv2 = TConv(cout, cout, 3)
        self.add = shortcut and cin == cout

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(tnn.Module):
    def __init__(self, cin, cout, n=1, shortcut=True):
        super().__init__()
        c_ = cout // 2
        self.cv1 = TConv(cin, c_, 1)
        self.cv2 = TConv(cin, c_, 1)
        self.cv3 = TConv(2 * c_, cout, 1)
        self.m = tnn.Sequential(
            *[TBottleneck(c_, c_, shortcut) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPPF(tnn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        c_ = cin // 2
        self.cv1 = TConv(cin, c_, 1)
        self.cv2 = TConv(c_ * 4, cout, 1)
        self.pool = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.pool(x)
        y2 = self.pool(y1)
        return self.cv2(torch.cat((x, y1, y2, self.pool(y2)), 1))


class TDetect(tnn.Module):
    def __init__(self, nc, chs, anchors_px):
        super().__init__()
        no = 3 * (5 + nc)
        self.m = tnn.ModuleList([tnn.Conv2d(c, no, 1) for c in chs])
        a = torch.tensor(anchors_px, dtype=torch.float32)
        a = a / torch.tensor([8.0, 16.0, 32.0]).view(3, 1, 1)
        self.register_buffer("anchors", a)      # grid units, like yolov5


class TYolo(tnn.Module):
    """yolov5 P5 graph with the standard indexed `model` list naming."""

    def __init__(self, nc=4, wm=0.25, dm=0.34):
        super().__init__()
        cfg = YoloConfig(num_classes=nc, depth_multiple=dm,
                         width_multiple=wm)
        w, d = cfg.width, cfg.depth
        self.model = tnn.ModuleList([
            TConv(3, w(64), 6, 2, 2),                      # 0
            TConv(w(64), w(128), 3, 2),                    # 1
            TC3(w(128), w(128), d(3)),                     # 2
            TConv(w(128), w(256), 3, 2),                   # 3
            TC3(w(256), w(256), d(6)),                     # 4
            TConv(w(256), w(512), 3, 2),                   # 5
            TC3(w(512), w(512), d(9)),                     # 6
            TConv(w(512), w(1024), 3, 2),                  # 7
            TC3(w(1024), w(1024), d(3)),                   # 8
            TSPPF(w(1024), w(1024)),                       # 9
            TConv(w(1024), w(512), 1),                     # 10
            tnn.Upsample(scale_factor=2, mode="nearest"),  # 11
            tnn.Identity(),                                # 12 concat
            TC3(w(1024), w(512), d(3), False),             # 13
            TConv(w(512), w(256), 1),                      # 14
            tnn.Upsample(scale_factor=2, mode="nearest"),  # 15
            tnn.Identity(),                                # 16 concat
            TC3(w(512), w(256), d(3), False),              # 17
            TConv(w(256), w(256), 3, 2),                   # 18
            tnn.Identity(),                                # 19 concat
            TC3(w(512), w(512), d(3), False),              # 20
            TConv(w(512), w(512), 3, 2),                   # 21
            tnn.Identity(),                                # 22 concat
            TC3(w(1024), w(1024), d(3), False),            # 23
            TDetect(nc, (w(256), w(512), w(1024)), cfg.anchors),  # 24
        ])

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        p3 = m[4](m[3](m[2](x)))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        u5 = m[10](p5)
        n4 = m[13](torch.cat((m[11](u5), p4), 1))
        u4 = m[14](n4)
        n3 = m[17](torch.cat((m[15](u4), p3), 1))
        n4b = m[20](torch.cat((m[18](n3), u4), 1))
        n5b = m[23](torch.cat((m[21](n4b), u5), 1))
        return [m[24].m[i](f) for i, f in enumerate((n3, n4b, n5b))]


def test_yolov5_conversion_parity():
    torch.manual_seed(11)
    tm = TYolo(nc=4, wm=0.25, dm=0.34).eval()
    # perturb BN running stats so parity exercises them
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.add_(torch.randn_like(mod.running_mean)
                                      * 0.1)
                mod.running_var.mul_(
                    1 + 0.2 * torch.rand_like(mod.running_var))

    cfg, sd = yolo_config_from_torch(tm.state_dict())
    assert cfg.num_classes == 4
    assert abs(cfg.width_multiple - 0.25) < 1e-6
    assert cfg.depth(3) == 1 and cfg.depth(6) == 2
    assert cfg.anchors[0][0] == (10.0, 13.0)       # rescaled back to px

    variables = convert_yolov5(sd, cfg)
    fm = YoloV5(cfg)

    imgs = rng.random((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    got = fm.apply(variables, jnp.asarray(imgs))
    assert len(got) == 3
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), wnt.permute(0, 2, 3, 1).numpy(),
            rtol=3e-4, atol=3e-4)

    # decode runs on the converted config (anchors in pixels)
    preds = decode_predictions([jnp.asarray(g) for g in got], cfg)
    assert preds.shape[-1] == 9 and np.isfinite(np.asarray(preds)).all()


class TProto(tnn.Module):
    """ultralytics Proto (common.py :834-845)."""

    def __init__(self, cin, c_, c2):
        super().__init__()
        self.cv1 = TConv(cin, c_, 3)
        self.upsample = tnn.Upsample(scale_factor=2, mode="nearest")
        self.cv2 = TConv(c_, c_, 3)
        self.cv3 = TConv(c_, c2, 1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegmentHead(tnn.Module):
    def __init__(self, nc, nm, npr, chs, anchors_px):
        super().__init__()
        no = 3 * (5 + nc + nm)
        self.m = tnn.ModuleList([tnn.Conv2d(c, no, 1) for c in chs])
        self.proto = TProto(chs[0], npr, nm)
        a = torch.tensor(anchors_px, dtype=torch.float32)
        a = a / torch.tensor([8.0, 16.0, 32.0]).view(3, 1, 1)
        self.register_buffer("anchors", a)


def test_yolov5_seg_conversion_parity():
    """Segment checkpoint (yolov5*-seg.pt layout): nm/npr derived from
    proto shapes, proto convs imported, maps + prototypes match."""
    torch.manual_seed(5)
    tm = TYolo(nc=4, wm=0.25, dm=0.34).eval()
    cfg0 = YoloConfig(num_classes=4, depth_multiple=0.34,
                      width_multiple=0.25)
    w = cfg0.width
    tm.model[24] = TSegmentHead(4, 6, 24, (w(256), w(512), w(1024)),
                                cfg0.anchors)
    tm = tm.eval()

    cfg, sd = yolo_config_from_torch(tm.state_dict())
    assert cfg.masks == 6 and cfg.protos == 24
    assert cfg.num_classes == 4

    from cross_modal_video_engine_tpu.models.yolo import postprocess_seg
    variables = convert_yolov5(sd, cfg)
    fm = YoloV5(cfg)
    imgs = rng.random((1, 64, 64, 3)).astype(np.float32)

    m = tm.model
    with torch.no_grad():
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        x = m[1](m[0](x))
        p3 = m[4](m[3](m[2](x)))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        u5 = m[10](p5)
        n4 = m[13](torch.cat((m[11](u5), p4), 1))
        u4 = m[14](n4)
        n3 = m[17](torch.cat((m[15](u4), p3), 1))
        n4b = m[20](torch.cat((m[18](n3), u4), 1))
        n5b = m[23](torch.cat((m[21](n4b), u5), 1))
        want = [m[24].m[i](f) for i, f in enumerate((n3, n4b, n5b))]
        want_proto = m[24].proto(n3)

    got, got_proto = fm.apply(variables, jnp.asarray(imgs))
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), wnt.permute(0, 2, 3, 1).numpy(),
            rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(got_proto), want_proto.permute(0, 2, 3, 1).numpy(),
        rtol=3e-4, atol=3e-4)

    preds = decode_predictions([jnp.asarray(g) for g in got], cfg)
    outs = postprocess_seg(np.asarray(preds), np.asarray(got_proto),
                           (64, 64), conf_thres=0.0, max_det=5)
    det, masks = outs[0]
    assert masks.shape == (len(det), 64, 64)


class TClassify(tnn.Module):
    """ultralytics Classify head (common.py :847-860)."""

    def __init__(self, cin, nc):
        super().__init__()
        self.conv = TConv(cin, 1280, 1)
        self.pool = tnn.AdaptiveAvgPool2d(1)
        self.linear = tnn.Linear(1280, nc)

    def forward(self, x):
        return self.linear(self.pool(self.conv(x)).flatten(1))


class TYoloCls(tnn.Module):
    def __init__(self, nc=7, wm=0.25, dm=0.34):
        super().__init__()
        cfg = YoloConfig(num_classes=nc, depth_multiple=dm,
                         width_multiple=wm)
        w, d = cfg.width, cfg.depth
        self.model = tnn.ModuleList([
            TConv(3, w(64), 6, 2, 2),
            TConv(w(64), w(128), 3, 2),
            TC3(w(128), w(128), d(3)),
            TConv(w(128), w(256), 3, 2),
            TC3(w(256), w(256), d(6)),
            TConv(w(256), w(512), 3, 2),
            TC3(w(512), w(512), d(9)),
            TConv(w(512), w(1024), 3, 2),
            TC3(w(1024), w(1024), d(3)),
            TClassify(w(1024), nc),
        ])

    def forward(self, x):
        for m in self.model:
            x = m(x)
        return x


def test_yolov5_cls_conversion_parity():
    from cross_modal_video_engine_tpu.convert import (
        convert_yolov5_cls, yolo_cls_config_from_torch)
    from cross_modal_video_engine_tpu.models.yolo import YoloClassifier
    torch.manual_seed(7)
    tm = TYoloCls(nc=7, wm=0.25, dm=0.34).eval()
    cfg, sd = yolo_cls_config_from_torch(tm.state_dict())
    assert cfg.num_classes == 7
    variables = convert_yolov5_cls(sd, cfg)
    fm = YoloClassifier(cfg)
    imgs = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
