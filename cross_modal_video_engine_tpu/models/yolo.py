"""YOLOv5-style object detector (concept-mask generator).

TPU rebuild of the MCT yolov5 fork's model (MCT/yolov5/models/yolo.py +
models/common.py): CSP backbone (Conv/C3/SPPF), PANet neck, 3-scale
anchor-based Detect head, followed by host-side NMS.  The raw per-scale
maps returned by `YoloV5.__call__` feed both the inference decode below
and the training criterion (losses/yolo.py + train/yolo_trainer.py +
cli/yolo_train.py — the reference train.py path).

Width/depth multiples select n/s/m/l variants like yolov5 yamls.
Activation is SiLU; detection decode follows yolov5's
(2*sigmoid(xy)-0.5+grid)*stride and (2*sigmoid(wh))^2*anchor convention.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# yolov5 P5 anchors (pixels at strides 8/16/32)
DEFAULT_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 80
    depth_multiple: float = 0.33     # yolov5n/s
    width_multiple: float = 0.25     # yolov5n
    img_size: int = 640
    anchors: Tuple = DEFAULT_ANCHORS
    masks: int = 0                   # nm > 0 = Segment head (yolov5-seg)
    protos: int = 0                  # npr channels; 0 = width-scaled 256
                                     # (the yaml default, models/yolo.py:94)
    # exact-math space-to-depth retiling of the 6x6 stride-2 stem
    # (ops/s2d_stem.py — at yolov5s width the stem tiles the MXU's N
    # dim at 25%; same param tree, same outputs).  Off pending the
    # on-chip A/B.
    s2d_stem: bool = False

    def depth(self, n: int) -> int:
        return max(1, round(n * self.depth_multiple))

    def width(self, c: int) -> int:
        return int(np.ceil(c * self.width_multiple / 8) * 8)


def _bn(train: bool, name: str = "bn"):
    # yolov5 BatchNorm2d(momentum=0.03, eps=1e-3) — torch momentum is
    # (1 - flax momentum).  Module-level factory so perf A/Bs can swap
    # the BN implementation in one place (bench_profile.profile_bn_ab).
    return nn.BatchNorm(use_running_average=not train, momentum=0.97,
                        epsilon=1e-3, name=name)


class ConvBnSiLU(nn.Module):
    out: int
    k: int = 1
    s: int = 1
    p: int = -1   # -1 = autopad k//2 (yolov5 stem uses explicit p=2 for k=6)
    s2d: bool = False   # route the 6x6 s=2 p=2 stem through the
                        # exact-math space-to-depth retiling

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.s2d:
            assert (self.k, self.s, self.p) == (6, 2, 2), \
                (self.k, self.s, self.p)
            from ..ops.s2d_stem import s2d_stem_conv_2d
            from .layers import KernelParams
            kp = KernelParams((6, 6, x.shape[-1], self.out), name="conv")
            x = s2d_stem_conv_2d(x, kp.kernel)
        else:
            pad = self.k // 2 if self.p < 0 else self.p
            x = nn.Conv(self.out, (self.k, self.k),
                        strides=(self.s, self.s),
                        padding=[(pad, pad), (pad, pad)], use_bias=False,
                        name="conv")(x)
        x = _bn(train)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = ConvBnSiLU(self.out, 1, name="cv1")(x, train=train)
        y = ConvBnSiLU(self.out, 3, name="cv2")(y, train=train)
        return x + y if (self.shortcut and x.shape[-1] == self.out) else y


class C3(nn.Module):
    out: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c_ = self.out // 2
        a = ConvBnSiLU(c_, 1, name="cv1")(x, train=train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, name=f"m{i}")(a, train=train)
        b = ConvBnSiLU(c_, 1, name="cv2")(x, train=train)
        return ConvBnSiLU(self.out, 1, name="cv3")(
            jnp.concatenate([a, b], -1), train=train)


class SPPF(nn.Module):
    out: int
    k: int = 5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBnSiLU(c_, 1, name="cv1")(x, train=train)
        p = self.k // 2
        pool = lambda y: nn.max_pool(y, (self.k, self.k), strides=(1, 1),
                                     padding=[(p, p), (p, p)])
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBnSiLU(self.out, 1, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], -1), train=train)


class Proto(nn.Module):
    """Mask prototype head (models/common.py Proto :834-845): two 3x3
    convs around a 2x nearest upsample, then 1x1 to nm channels — maps
    the P3 neck feature (stride 8) to stride-4 prototype maps."""
    npr: int
    nm: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvBnSiLU(self.npr, 3, name="cv1")(x, train=train)
        x = jax.image.resize(x, (x.shape[0], x.shape[1] * 2,
                                 x.shape[2] * 2, x.shape[3]), "nearest")
        x = ConvBnSiLU(self.npr, 3, name="cv2")(x, train=train)
        return ConvBnSiLU(self.nm, 1, name="cv3")(x, train=train)


def _detect_bias_init(stride: int, na: int, nc: int, nm: int):
    """Detect-head bias priors (_initialize_biases, models/yolo.py
    :253-261): objectness starts at log(8 objects / (640/stride)² cells)
    and class logits at log(0.6/(nc-0.999999)), so a from-scratch model
    doesn't begin with sigmoid=0.5 on every anchor (which floods the
    first epochs with objectness false-positive loss).  Imported
    checkpoints overwrite these."""
    import math

    def init(key, shape, dtype=jnp.float32):
        b = np.zeros((na, 5 + nc + nm), np.float32)
        b[:, 4] = math.log(8.0 / (640.0 / stride) ** 2)
        b[:, 5:5 + nc] = math.log(0.6 / (nc - 0.999999))
        assert b.size == shape[0], (b.shape, shape)
        return jnp.asarray(b.reshape(-1), dtype)

    return init


class YoloV5(nn.Module):
    cfg: YoloConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, *, train: bool = False):
        """images: (B, H, W, 3) float in [0,1].  Returns raw per-scale maps
        [(B, Hi, Wi, 3*(5+nc))] at strides 8/16/32; with cfg.masks > 0
        (the Segment head, models/yolo.py:92-107) the per-anchor channel
        count becomes 5+nc+nm and a second output — stride-4 prototype
        maps (B, H/4, W/4, nm) — is appended."""
        cfg = self.cfg
        w, d = cfg.width, cfg.depth
        x = ConvBnSiLU(w(64), 6, 2, p=2, s2d=cfg.s2d_stem,
                       name="stem")(images, train=train)
        x = ConvBnSiLU(w(128), 3, 2, name="down1")(x, train=train)
        x = C3(w(128), d(3), name="c3_1")(x, train=train)
        x = ConvBnSiLU(w(256), 3, 2, name="down2")(x, train=train)
        p3 = C3(w(256), d(6), name="c3_2")(x, train=train)
        x = ConvBnSiLU(w(512), 3, 2, name="down3")(p3, train=train)
        p4 = C3(w(512), d(9), name="c3_3")(x, train=train)
        x = ConvBnSiLU(w(1024), 3, 2, name="down4")(p4, train=train)
        x = C3(w(1024), d(3), name="c3_4")(x, train=train)
        p5 = SPPF(w(1024), name="sppf")(x, train=train)

        # PANet top-down
        u5 = ConvBnSiLU(w(512), 1, name="up5_conv")(p5, train=train)
        u = jax.image.resize(u5, (u5.shape[0], u5.shape[1] * 2,
                                  u5.shape[2] * 2, u5.shape[3]), "nearest")
        n4 = C3(w(512), d(3), False, name="n4")(
            jnp.concatenate([u, p4], -1), train=train)
        u4 = ConvBnSiLU(w(256), 1, name="up4_conv")(n4, train=train)
        u = jax.image.resize(u4, (u4.shape[0], u4.shape[1] * 2,
                                  u4.shape[2] * 2, u4.shape[3]), "nearest")
        n3 = C3(w(256), d(3), False, name="n3")(
            jnp.concatenate([u, p3], -1), train=train)

        # bottom-up
        dpath = ConvBnSiLU(w(256), 3, 2, name="pan3")(n3, train=train)
        n4b = C3(w(512), d(3), False, name="n4b")(
            jnp.concatenate([dpath, u4], -1), train=train)
        dpath = ConvBnSiLU(w(512), 3, 2, name="pan4")(n4b, train=train)
        n5b = C3(w(1024), d(3), False, name="n5b")(
            jnp.concatenate([dpath, u5], -1), train=train)

        no = 3 * (5 + cfg.num_classes + cfg.masks)
        outs = []
        for i, feat in enumerate((n3, n4b, n5b)):
            outs.append(nn.Conv(
                no, (1, 1), name=f"detect_{i}",
                bias_init=_detect_bias_init(
                    (8, 16, 32)[i], 3, cfg.num_classes,
                    cfg.masks))(feat))
        if cfg.masks > 0:
            proto = Proto(cfg.protos or w(256), cfg.masks,
                          name="proto")(n3, train=train)
            return outs, proto
        return outs


class YoloClassifier(nn.Module):
    """yolov5-cls (models/yolo.py ClassificationModel :273-292): the
    detection backbone with the SPPF slot (cutoff=10's model[-1])
    replaced by the Classify head (common.py :847-860) — 1x1 conv to a
    fixed 1280 channels (not width-scaled), global average pool,
    dropout(p=0), linear to nc.  Backbone submodule names match
    YoloV5's so detection checkpoints initialize the trunk 1:1 (the
    reference builds ClassificationModel *from* a detection model).
    """
    cfg: YoloConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, *, train: bool = False):
        cfg = self.cfg
        w, d = cfg.width, cfg.depth
        x = ConvBnSiLU(w(64), 6, 2, p=2, s2d=cfg.s2d_stem,
                       name="stem")(images, train=train)
        x = ConvBnSiLU(w(128), 3, 2, name="down1")(x, train=train)
        x = C3(w(128), d(3), name="c3_1")(x, train=train)
        x = ConvBnSiLU(w(256), 3, 2, name="down2")(x, train=train)
        x = C3(w(256), d(6), name="c3_2")(x, train=train)
        x = ConvBnSiLU(w(512), 3, 2, name="down3")(x, train=train)
        x = C3(w(512), d(9), name="c3_3")(x, train=train)
        x = ConvBnSiLU(w(1024), 3, 2, name="down4")(x, train=train)
        x = C3(w(1024), d(3), name="c3_4")(x, train=train)
        x = ConvBnSiLU(1280, 1, name="classify_conv")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(cfg.num_classes, name="classify_linear")(x)


def decode_predictions(raw_maps: Sequence[jnp.ndarray], cfg: YoloConfig
                       ) -> jnp.ndarray:
    """yolov5 head decode -> (B, N, 5+nc[+nm]) with xywh in input pixels.

    With cfg.masks > 0 the decode follows the Segment branch
    (models/yolo.py:67-71): sigmoid on xy/wh/conf only, mask
    coefficients pass through raw."""
    strides = (8, 16, 32)
    outs = []
    nc, nm = cfg.num_classes, cfg.masks
    for raw, stride, anchors in zip(raw_maps, strides, cfg.anchors):
        B, H, W, _ = raw.shape
        x = raw.reshape(B, H, W, 3, 5 + nc + nm)
        sig = jax.nn.sigmoid(x[..., :5 + nc])
        gy = jnp.arange(H, dtype=jnp.float32)[:, None]
        gx = jnp.arange(W, dtype=jnp.float32)[None, :]
        grid = jnp.stack([jnp.broadcast_to(gx, (H, W)),
                          jnp.broadcast_to(gy, (H, W))], -1)  # (H, W, 2) xy
        anch = jnp.asarray(anchors, jnp.float32)               # (3, 2)
        xy = (sig[..., :2] * 2.0 - 0.5 + grid[:, :, None, :]) * stride
        wh = (sig[..., 2:4] * 2.0) ** 2 * anch[None, None, :, :]
        parts = [xy, wh, sig[..., 4:]]
        if nm:
            parts.append(x[..., 5 + nc:])
        out = jnp.concatenate(parts, -1)
        outs.append(out.reshape(B, H * W * 3, 5 + nc + nm))
    return jnp.concatenate(outs, axis=1)


def process_mask(proto: np.ndarray, coefs: np.ndarray, boxes_xyxy: np.ndarray,
                 img_hw: Tuple[int, int], upsample: bool = True) -> np.ndarray:
    """Instance masks from prototype maps
    (utils/segment/general.py process_mask :44-67): per-instance
    mask = sigmoid(coefs @ proto), cropped to the box at prototype
    resolution, optionally bilinear-upsampled (align_corners=False ==
    half-pixel centers, jax.image.resize's convention) to the input
    image and thresholded at 0.5.

    proto: (Hm, Wm, nm) one image's prototypes; coefs: (n, nm);
    boxes_xyxy: (n, 4) in input pixels.  Returns (n, H, W) bool.
    """
    Hm, Wm, nm = proto.shape
    ih, iw = img_hw
    p = jnp.asarray(proto, jnp.float32).reshape(Hm * Wm, nm)
    masks = jax.nn.sigmoid(
        jnp.asarray(coefs, jnp.float32) @ p.T).reshape(-1, Hm, Wm)
    down = np.asarray(boxes_xyxy, np.float64) \
        * np.array([Wm / iw, Hm / ih, Wm / iw, Hm / ih])
    r = jnp.arange(Wm, dtype=jnp.float32)[None, None, :]
    c = jnp.arange(Hm, dtype=jnp.float32)[None, :, None]
    x1, y1, x2, y2 = (jnp.asarray(down[:, i], jnp.float32)[:, None, None]
                      for i in range(4))
    masks = masks * ((r >= x1) & (r < x2) & (c >= y1) & (c < y2))
    if upsample and (Hm, Wm) != (ih, iw):
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), "bilinear")
    return np.asarray(masks > 0.5)


# -- test-time augmentation (reference models/yolo.py:206-251 ---------------
# _forward_augment: scales (1, .83, .67) x flips (none, lr, none),
# predictions de-scaled back to the original frame, per-pass tails
# clipped, then concatenated into one (B, N_tta, 5+nc) tensor that
# feeds the ordinary NMS.

TTA_SCALES = ((1.0, 0), (0.83, 3), (0.67, 0))   # (ratio, flip axis: 3=lr)


def scale_img(images: jnp.ndarray, ratio: float, gs: int = 32,
              pad_value: float = 0.447) -> jnp.ndarray:
    """(B, H, W, 3): bilinear resize by `ratio`, bottom/right-pad with
    the imagenet mean to the next gs multiple (utils/torch_utils.py:
    297-306 scale_img; F.interpolate align_corners=False == jax
    half-pixel 'bilinear')."""
    if ratio == 1.0:
        return images
    B, H, W, C = images.shape
    nh, nw = int(H * ratio), int(W * ratio)
    # antialias=False: F.interpolate(mode='bilinear') does not smooth on
    # downscale; jax.image.resize antialiases by default and diverges
    out = jax.image.resize(images, (B, nh, nw, C), "bilinear",
                           antialias=False)
    ph = int(math.ceil(H * ratio / gs) * gs) - nh
    pw = int(math.ceil(W * ratio / gs) * gs) - nw
    return jnp.pad(out, ((0, 0), (0, ph), (0, pw), (0, 0)),
                   constant_values=pad_value)


def descale_pred(p: jnp.ndarray, flip: int, scale: float,
                 img_hw: Tuple[int, int]) -> jnp.ndarray:
    """Undo one TTA pass's geometry on decoded preds (B, N, 5+nc):
    xywh back to original pixels, flipped x (or y) mirrored
    (models/yolo.py:225-240 _descale_pred)."""
    x = p[..., 0:1] / scale
    y = p[..., 1:2] / scale
    wh = p[..., 2:4] / scale
    if flip == 2:
        y = img_hw[0] - y
    elif flip == 3:
        x = img_hw[1] - x
    return jnp.concatenate([x, y, wh, p[..., 4:]], -1)


def clip_augmented(ys: list, nl: int = 3) -> list:
    """Drop the first pass's coarsest-layer tail and the last pass's
    finest-layer head (models/yolo.py:242-251 _clip_augmented — large
    objects come from the downscaled passes, small ones from full res).
    Assumes decode order P3..P5 with 4x grid-count ratios."""
    g = sum(4 ** k for k in range(nl))
    i = (ys[0].shape[1] // g) * 1
    ys[0] = ys[0][:, :-i]
    i = (ys[-1].shape[1] // g) * 4 ** (nl - 1)
    ys[-1] = ys[-1][:, i:]
    return ys


def nms(boxes_xywh: np.ndarray, scores: np.ndarray, classes: np.ndarray,
        iou_thres: float = 0.45, max_det: int = 300) -> np.ndarray:
    """Class-aware NMS on host; boxes in xywh. Returns kept row indices."""
    if len(boxes_xywh) == 0:
        return np.zeros((0,), np.int64)
    x1 = boxes_xywh[:, 0] - boxes_xywh[:, 2] / 2
    y1 = boxes_xywh[:, 1] - boxes_xywh[:, 3] / 2
    x2 = boxes_xywh[:, 0] + boxes_xywh[:, 2] / 2
    y2 = boxes_xywh[:, 1] + boxes_xywh[:, 3] / 2
    # offset by class so boxes of different classes never suppress
    off = classes.astype(np.float64) * 4096.0
    x1o, x2o = x1 + off, x2 + off
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores)
    keep = []
    while order.size and len(keep) < max_det:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1o[i], x1o[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2o[i], x2o[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-9)
        order = order[1:][iou <= iou_thres]
    return np.asarray(keep, np.int64)


def postprocess(preds: np.ndarray, conf_thres: float = 0.25,
                iou_thres: float = 0.45, max_det: int = 300,
                multi_label: bool = False) -> List[np.ndarray]:
    """(B, N, 5+nc) -> per image (n, 6): x1,y1,x2,y2,conf,cls
    (yolov5 utils/general.py non_max_suppression semantics).

    multi_label=False (detect.py default) keeps the argmax class per
    box; True emits one candidate per (box, class) above conf_thres —
    the val.py protocol (val.py passes multi_label=True), which matters
    at val's conf=0.001 where confusable classes both clear the bar."""
    out = []
    for p in preds:
        conf = p[:, 4:5] * p[:, 5:]
        if multi_label:
            bi, cls = np.nonzero(conf > conf_thres)
            score = conf[bi, cls]
            p = p[bi]
        else:
            cls = conf.argmax(1)
            score = conf[np.arange(len(conf)), cls]
            m = score > conf_thres
            p, cls, score = p[m], cls[m], score[m]
        keep = nms(p[:, :4], score, cls, iou_thres, max_det)
        b = p[keep]
        xyxy = np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                         b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], 1)
        out.append(np.concatenate(
            [xyxy, score[keep, None], cls[keep, None].astype(np.float64)], 1))
    return out


def postprocess_seg(preds: np.ndarray, protos: np.ndarray,
                    img_hw: Tuple[int, int], conf_thres: float = 0.25,
                    iou_thres: float = 0.45, max_det: int = 300,
                    multi_label: bool = False
                    ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Segmentation NMS + mask assembly (segment/predict.py:100-118:
    non_max_suppression(nm=32) then process_mask).

    preds: (B, N, 5+nc+nm) from `decode_predictions` on a masks>0
    model; protos: (B, Hm, Wm, nm).  Returns per image
    (det (n, 6) [x1,y1,x2,y2,conf,cls], masks (n, H, W) bool).
    multi_label: see `postprocess` — the segment/val.py protocol.
    """
    nm = protos.shape[-1]
    out = []
    for p, proto in zip(np.asarray(preds), protos):
        box, obj, clsp, coefs = np.split(p, [4, 5, p.shape[1] - nm], axis=1)
        conf = obj * clsp
        if multi_label:
            bi, cls = np.nonzero(conf > conf_thres)
            score = conf[bi, cls]
            box, coefs = box[bi], coefs[bi]
        else:
            cls = conf.argmax(1)
            score = conf[np.arange(len(conf)), cls]
            m = score > conf_thres
            box, cls, score, coefs = box[m], cls[m], score[m], coefs[m]
        keep = nms(box, score, cls, iou_thres, max_det)
        b = box[keep]
        xyxy = np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                         b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], 1)
        det = np.concatenate(
            [xyxy, score[keep, None], cls[keep, None].astype(np.float64)], 1)
        if len(keep):
            masks = process_mask(proto, coefs[keep], xyxy, img_hw)
        else:
            masks = np.zeros((0,) + tuple(img_hw), bool)
        out.append((det, masks))
    return out
