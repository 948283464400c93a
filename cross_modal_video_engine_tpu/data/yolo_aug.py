"""YOLOv5 detection augmentation pipeline (host-side numpy/cv2).

Rebuild of the reference detector's sample pipeline
(MCT/yolov5/utils/augmentations.py + utils/dataloaders.py):

* `augment_hsv` — LUT-based HSV jitter (augmentations.py:67-81)
* `random_perspective` — the composed center/perspective/rotation-scale/
  shear/translation warp with box transform + `box_candidates`
  filtering (augmentations.py:144-237, 297-302)
* `mosaic4` — the 4-image mosaic canvas (dataloaders.py load_mosaic
  :750-806); the border-trimming `random_perspective(border=-s/2)` call
  lives in the caller like the reference
* `mixup` — beta(32, 32) image blend (augmentations.py:289-294)
* coordinate helpers `xywhn2xyxy` / `xyxy2xywhn` (utils/general.py)

All randomness flows through an explicit `np.random.RandomState` so
training runs are reproducible per seed (the reference uses the global
`random` module).  Images are RGB uint8 throughout (the reference is
BGR; hue jitter statistics are unaffected by channel order since the
HSV conversion is applied consistently).

Augmentation lives on the host by design: it is branchy, per-sample,
uint8 work that would fragment an XLA program, while the device step
(train/yolo_trainer.py) stays one fixed-shape jit.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np


class YoloAugHyp(NamedTuple):
    """Augmentation hyperparameters (hyp.scratch-low.yaml:22-35)."""
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    flipud: float = 0.0
    fliplr: float = 0.5
    mosaic: float = 1.0
    mixup: float = 0.0
    copy_paste: float = 0.0   # segment-only (utils/augmentations.py:240)


def xywhn2xyxy(x: np.ndarray, w: float, h: float, padw: float = 0.0,
               padh: float = 0.0) -> np.ndarray:
    """Normalized cxcywh -> pixel xyxy (utils/general.py)."""
    y = np.empty_like(x, dtype=np.float64)
    y[:, 0] = w * (x[:, 0] - x[:, 2] / 2) + padw
    y[:, 1] = h * (x[:, 1] - x[:, 3] / 2) + padh
    y[:, 2] = w * (x[:, 0] + x[:, 2] / 2) + padw
    y[:, 3] = h * (x[:, 1] + x[:, 3] / 2) + padh
    return y


def xyxy2xywhn(x: np.ndarray, w: float, h: float, clip: bool = True,
               eps: float = 1e-3) -> np.ndarray:
    """Pixel xyxy -> normalized cxcywh with edge clipping."""
    x = x.astype(np.float64).copy()
    if clip:
        x[:, [0, 2]] = x[:, [0, 2]].clip(0, w - eps)
        x[:, [1, 3]] = x[:, [1, 3]].clip(0, h - eps)
    y = np.empty_like(x)
    y[:, 0] = ((x[:, 0] + x[:, 2]) / 2) / w
    y[:, 1] = ((x[:, 1] + x[:, 3]) / 2) / h
    y[:, 2] = (x[:, 2] - x[:, 0]) / w
    y[:, 3] = (x[:, 3] - x[:, 1]) / h
    return y


def augment_hsv(img: np.ndarray, rng: np.random.RandomState,
                hgain: float = 0.5, sgain: float = 0.5,
                vgain: float = 0.5) -> np.ndarray:
    """LUT HSV jitter (augmentations.py:67-81).  Returns a new image."""
    if not (hgain or sgain or vgain):
        return img
    import cv2
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(img.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
    hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                     cv2.LUT(val, lut_val)))
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def box_candidates(box1: np.ndarray, box2: np.ndarray, wh_thr: float = 2,
                   ar_thr: float = 100, area_thr: float = 0.1,
                   eps: float = 1e-16) -> np.ndarray:
    """Keep boxes that survived the warp (augmentations.py:297-302);
    box1/box2 are (4, n) xyxy before/after."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


def _warp_canvas(img: np.ndarray, rng: np.random.RandomState,
                 degrees: float, translate: float, scale: float,
                 shear: float, perspective: float,
                 border: Tuple[int, int]
                 ) -> Tuple[np.ndarray, np.ndarray, float, int, int]:
    """The shared matrix composition + image warp of random_perspective
    and its segment variant (augmentations.py:144-182): center, random
    perspective/rotation-scale/shear/translation, composed as
    T@S@R@P@C.  Returns (warped img, M, scale s, width, height); the
    RNG draw order matches the reference exactly."""
    import cv2
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height
    M = T @ S @ R @ P @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height),
                                      borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                                 borderValue=(114, 114, 114))
    return img, M, s, width, height


def random_perspective(img: np.ndarray, targets: np.ndarray,
                       rng: np.random.RandomState,
                       degrees: float = 10, translate: float = 0.1,
                       scale: float = 0.1, shear: float = 10,
                       perspective: float = 0.0,
                       border: Tuple[int, int] = (0, 0)
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """augmentations.py:144-237.  targets: (n, 5) [cls, x1, y1, x2, y2]
    pixel boxes.  border<0 trims a mosaic canvas back to img_size."""
    img, M, s, width, height = _warp_canvas(
        img, rng, degrees, translate, scale, shear, perspective, border)

    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective
              else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], 1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = box_candidates(targets[:, 1:5].T * s, new.T, area_thr=0.10)
        targets = targets[keep].copy()
        targets[:, 1:5] = new[keep]
    return img, targets


def mosaic4(items: Sequence[Tuple[np.ndarray, np.ndarray]], img_size: int,
            rng: np.random.RandomState
            ) -> Tuple[np.ndarray, np.ndarray]:
    """4-image mosaic canvas (dataloaders.py load_mosaic:750-791).

    items: four (image, labels) pairs — image uint8 with its long side
    already resized to `img_size` (load_image semantics :730-744),
    labels (n, 5) normalized [cls, cx, cy, w, h].  Returns the
    (2s, 2s, 3) canvas and (m, 5) pixel-xyxy labels clipped to it; the
    caller applies `random_perspective(border=(-s//2, -s//2))` like the
    reference.
    """
    img4, out, _ = mosaic4_seg([(img, labels, []) for img, labels in items],
                               img_size, rng)
    return img4, out


def mixup(img: np.ndarray, labels: np.ndarray, img2: np.ndarray,
          labels2: np.ndarray, rng: np.random.RandomState
          ) -> Tuple[np.ndarray, np.ndarray]:
    """Beta(32, 32) blend (augmentations.py:289-294)."""
    r = rng.beta(32.0, 32.0)
    out = (img.astype(np.float32) * r
           + img2.astype(np.float32) * (1 - r)).astype(np.uint8)
    return out, np.concatenate((labels, labels2), 0)


def segments2boxes(segments: Sequence[Tuple[float, np.ndarray]]
                   ) -> np.ndarray:
    """Polygon rows -> (n, 5) [cls, cx, cy, w, h] in the polygon's own
    coordinate frame (utils/general.py segments2boxes: xyxy from
    min/max then xywh)."""
    boxes = []
    for cls, pts in segments:
        x, y = pts[:, 0], pts[:, 1]
        boxes.append([cls, (x.min() + x.max()) / 2,
                      (y.min() + y.max()) / 2,
                      x.max() - x.min(), y.max() - y.min()])
    return (np.asarray(boxes, np.float32) if boxes
            else np.zeros((0, 5), np.float32))


def resample_segments(segments: List[np.ndarray], n: int = 1000
                      ) -> List[np.ndarray]:
    """Up-sample each closed polygon to n points by linear
    interpolation along the vertex index (utils/general.py
    resample_segments:817-824) so per-point warps + inside-image
    clipping approximate the true warped region."""
    out = []
    for s in segments:
        s = np.concatenate((s, s[0:1, :]), axis=0)
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out.append(np.stack([np.interp(x, xp, s[:, i])
                             for i in range(2)], 1))
    return out


def segment2box(segment: np.ndarray, width: float, height: float
                ) -> np.ndarray:
    """Polygon -> xyxy box over the points inside the image
    (utils/general.py segment2box:800-805)."""
    x, y = segment.T
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    return (np.array([x.min(), y.min(), x.max(), y.max()])
            if len(x) else np.zeros(4))


def bbox_ioa(box1: np.ndarray, box2: np.ndarray,
             eps: float = 1e-7) -> np.ndarray:
    """Intersection over box2 area; box1 (4,), box2 (n, 4) xyxy
    (utils/metrics.py bbox_ioa:284-302)."""
    b1x1, b1y1, b1x2, b1y2 = box1
    b2x1, b2y1, b2x2, b2y2 = box2.T
    inter = ((np.minimum(b1x2, b2x2) - np.maximum(b1x1, b2x1)).clip(0)
             * (np.minimum(b1y2, b2y2) - np.maximum(b1y1, b2y1)).clip(0))
    area2 = (b2x2 - b2x1) * (b2y2 - b2y1) + eps
    return inter / area2


def copy_paste(img: np.ndarray, labels: np.ndarray,
               segments: List[np.ndarray], p: float,
               rng: np.random.RandomState):
    """Copy-Paste augmentation (utils/augmentations.py copy_paste:
    240-259; arXiv 2012.07177): paste the horizontal mirror of
    round(p*n) instances whose mirrored box obscures no existing label
    by >=30% IoA.  labels are pixel-xyxy (n, 5); segments pixel
    polygons."""
    import cv2
    n = len(segments)
    if p and n:
        h, w = img.shape[:2]
        im_new = np.zeros(img.shape, np.uint8)
        for j in rng.choice(n, size=round(p * n), replace=False):
            l, s = labels[j], segments[j]
            box = w - l[3], l[2], w - l[1], l[4]
            ioa = bbox_ioa(np.asarray(box), labels[:, 1:5])
            if (ioa < 0.30).all():
                labels = np.concatenate((labels, [[l[0], *box]]), 0)
                segments.append(
                    np.concatenate((w - s[:, 0:1], s[:, 1:2]), 1))
                cv2.drawContours(im_new, [s.astype(np.int32)], -1,
                                 (1, 1, 1), cv2.FILLED)
        result = cv2.flip(img, 1)
        i = cv2.flip(im_new, 1).astype(bool)
        img = img.copy()
        img[i] = result[i]
    return img, labels, segments


def random_perspective_seg(img: np.ndarray, targets: np.ndarray,
                           segments: List[np.ndarray],
                           rng: np.random.RandomState,
                           degrees: float = 10, translate: float = 0.1,
                           scale: float = 0.1, shear: float = 10,
                           perspective: float = 0.0,
                           border: Tuple[int, int] = (0, 0)):
    """Segment variant of `random_perspective`
    (utils/segment/augmentations.py random_perspective): polygons are
    resampled to 1000 points, warped through the same composed matrix,
    and each target box is re-derived from its warped polygon's
    inside-image extent (segment2box); survivors filter with the
    looser area_thr=0.01.  Returns (img, (m, 5) pixel-xyxy targets,
    warped polygons)."""
    img, M, s, width, height = _warp_canvas(
        img, rng, degrees, translate, scale, shear, perspective, border)

    n = len(targets)
    if n:
        segments = resample_segments(list(segments))
        new = np.zeros((n, 4))
        new_segs = []
        for i, seg in enumerate(segments):
            xy = np.ones((len(seg), 3))
            xy[:, :2] = seg
            xy = xy @ M.T
            xy = xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]
            new[i] = segment2box(xy, width, height)
            new_segs.append(xy)
        keep = box_candidates(targets[:, 1:5].T * s, new.T,
                              area_thr=0.01)
        targets = targets[keep].copy()
        targets[:, 1:5] = new[keep]
        segments = [ns for ns, k in zip(new_segs, keep) if k]
    return img, targets, segments


def mosaic4_seg(items, img_size: int, rng: np.random.RandomState):
    """Segment variant of `mosaic4` (utils/segment/dataloaders.py
    load_mosaic:208-253): items are (image, (n,5) normalized labels,
    [polygon (k,2) normalized]) triples; polygons ride the same
    scale+pad as the boxes (xyn2xy) and clip to the 2s canvas.
    Returns (canvas, pixel-xyxy labels, pixel polygons)."""
    s = img_size
    yc, xc = (int(rng.uniform(s // 2, 2 * s - s // 2)) for _ in range(2))
    labels4: List[np.ndarray] = []
    segments4: List[np.ndarray] = []
    img4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    for i, (img, labels, segs) in enumerate(items):
        h, w = img.shape[:2]
        if i == 0:    # top left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:         # bottom right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(labels):
            lab = labels.astype(np.float64).copy()
            lab[:, 1:5] = xywhn2xyxy(labels[:, 1:5], w, h, padw, padh)
            labels4.append(lab)
            segments4.extend(p * [w, h] + [padw, padh] for p in segs)
    if labels4:
        out = np.concatenate(labels4, 0)
        out[:, 1:5] = out[:, 1:5].clip(0, 2 * s)
        segments4 = [p.clip(0, 2 * s) for p in segments4]
    else:
        out = np.zeros((0, 5), np.float64)
    return img4, out, segments4


def augment_seg_sample(load, index: int, n_items: int, img_size: int,
                       hyp: YoloAugHyp, rng: np.random.RandomState):
    """One yolov5-seg training sample through the full pipeline
    (utils/segment/dataloaders.py __getitem__:107-206): mosaic(+mixup)
    or letterbox, segment-aware random_perspective, HSV, flips.

    load(i) -> (uint8 RGB image, [polygon (k, 2) normalized]) — labels
    derive from polygon extents like the reference loader.  Returns
    (img_size² uint8 image, (m, 5) normalized [cls,cx,cy,w,h] labels,
    [pixel-space polygon]) — the caller rasterizes masks at its
    mask_ratio (rasterization order is flip-safe because flips are
    applied to the polygons here, before rasterization).
    """
    def load_scaled(i):
        img, polys = load(i)
        img = load_image_resized(img, img_size)
        labels = segments2boxes([(c, p) for c, p in polys])
        return img, labels, [p for _, p in polys]

    use_mosaic = rng.rand() < hyp.mosaic

    def one_mosaic(idx):
        picks = [idx] + [int(rng.randint(n_items)) for _ in range(3)]
        rng.shuffle(picks)
        items = [load_scaled(j) for j in picks]
        img4, lab4, seg4 = mosaic4_seg(items, img_size, rng)
        img4, lab4, seg4 = copy_paste(img4, lab4, seg4,
                                      hyp.copy_paste, rng)
        return random_perspective_seg(
            img4, lab4, seg4, rng, hyp.degrees, hyp.translate,
            hyp.scale, hyp.shear, hyp.perspective,
            border=(-img_size // 2, -img_size // 2))

    if use_mosaic:
        img, labels, segs = one_mosaic(index)
        if rng.rand() < hyp.mixup:
            img2, labels2, segs2 = one_mosaic(int(rng.randint(n_items)))
            img, labels = mixup(img, labels, img2, labels2, rng)
            segs = segs + segs2
    else:
        from ..train.yolo_trainer import letterbox
        raw, labels, segs = load_scaled(index)
        h, w = raw.shape[:2]
        img, r, pad = letterbox(raw, img_size)
        labels = labels.astype(np.float64).copy()
        if len(labels):
            labels[:, 1:5] = xywhn2xyxy(labels[:, 1:5], r * w, r * h,
                                        pad[0], pad[1])
        segs = [p * [r * w, r * h] + list(pad) for p in segs]
        img, labels, segs = random_perspective_seg(
            img, labels, segs, rng, hyp.degrees, hyp.translate,
            hyp.scale, hyp.shear, hyp.perspective)

    if len(labels):
        labels = labels.copy()
        labels[:, 1:5] = xyxy2xywhn(labels[:, 1:5], img.shape[1],
                                    img.shape[0])
    img = augment_hsv(img, rng, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v)
    if rng.rand() < hyp.flipud:
        img = np.flipud(img)
        if len(labels):
            labels[:, 2] = 1 - labels[:, 2]
            segs = [np.stack([p[:, 0], img.shape[0] - p[:, 1]], 1)
                    for p in segs]
    if rng.rand() < hyp.fliplr:
        img = np.fliplr(img)
        if len(labels):
            labels[:, 1] = 1 - labels[:, 1]
            segs = [np.stack([img.shape[1] - p[:, 0], p[:, 1]], 1)
                    for p in segs]
    return (np.ascontiguousarray(img), labels.astype(np.float32), segs)


def load_image_resized(img: np.ndarray, img_size: int,
                       augment: bool = True) -> np.ndarray:
    """load_image resize: long side -> img_size (dataloaders.py:730-744)."""
    import cv2
    h0, w0 = img.shape[:2]
    r = img_size / max(h0, w0)
    if r != 1:
        interp = cv2.INTER_LINEAR if (augment or r > 1) else cv2.INTER_AREA
        img = cv2.resize(img, (math.ceil(w0 * r), math.ceil(h0 * r)),
                         interpolation=interp)
    return img


def augment_sample(load, index: int, n_items: int, img_size: int,
                   hyp: YoloAugHyp, rng: np.random.RandomState
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """One training sample through the full pipeline
    (dataloaders.py __getitem__:653-727, mosaic branch + common tail).

    load(i) -> (uint8 RGB image, (n, 5) normalized [cls,cx,cy,w,h]).
    Returns (img_size² uint8 image, (m, 5) normalized labels).
    """
    use_mosaic = rng.rand() < hyp.mosaic

    def one_mosaic(idx):
        picks = [idx] + [int(rng.randint(n_items)) for _ in range(3)]
        rng.shuffle(picks)
        items = []
        for j in picks:
            img, lab = load(j)
            items.append((load_image_resized(img, img_size), lab))
        img4, lab4 = mosaic4(items, img_size, rng)
        return random_perspective(
            img4, lab4, rng, hyp.degrees, hyp.translate, hyp.scale,
            hyp.shear, hyp.perspective,
            border=(-img_size // 2, -img_size // 2))

    if use_mosaic:
        img, labels = one_mosaic(index)
        if rng.rand() < hyp.mixup:
            img2, labels2 = one_mosaic(int(rng.randint(n_items)))
            img, labels = mixup(img, labels, img2, labels2, rng)
    else:
        from ..train.yolo_trainer import letterbox
        raw, lab = load(index)
        raw = load_image_resized(raw, img_size)
        h, w = raw.shape[:2]
        img, r, pad = letterbox(raw, img_size)
        labels = lab.astype(np.float64).copy()
        if len(labels):
            labels[:, 1:5] = xywhn2xyxy(lab[:, 1:5], r * w, r * h,
                                        pad[0], pad[1])
        img, labels = random_perspective(
            img, labels, rng, hyp.degrees, hyp.translate, hyp.scale,
            hyp.shear, hyp.perspective)

    if len(labels):
        labels = labels.copy()
        labels[:, 1:5] = xyxy2xywhn(labels[:, 1:5], img.shape[1],
                                    img.shape[0])
    img = augment_hsv(img, rng, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v)
    if rng.rand() < hyp.flipud:
        img = np.flipud(img)
        if len(labels):
            labels[:, 2] = 1 - labels[:, 2]
    if rng.rand() < hyp.fliplr:
        img = np.fliplr(img)
        if len(labels):
            labels[:, 1] = 1 - labels[:, 1]
    return np.ascontiguousarray(img), labels.astype(np.float32)
