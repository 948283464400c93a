"""Config-driven YOLOv5 detector training CLI.

TPU rebuild of the reference detector's train entry
(MCT/yolov5/train.py): yolov5-format datasets (an image directory plus
a label directory of per-image ``cls cx cy w h`` text rows, normalized
xywh), letterbox + horizontal-flip augmentation, the 3-group SGD with
warmup/one-cycle schedule and EMA (train/yolo_trainer.py), the
ComputeLoss criterion (losses/yolo.py), the full mosaic / mixup /
random-perspective / HSV / flip sample pipeline (data/yolo_aug.py),
and per-epoch validation of the EMA weights with COCO-protocol mAP
(metrics/detection.py — the val.py stack).  `load_from` starts from
imported yolov5 weights (train.py `--weights` semantics).

Config shape:

    model = dict(num_classes=80, depth_multiple=0.33,
                 width_multiple=0.50, img_size=640)
    data = dict(train=dict(img_dir='train/images',
                           label_dir='train/labels'),
                val=dict(img_dir='val/images', label_dir='val/labels'),
                batch_size=16, max_targets=64)
    aug = dict(mosaic=1.0, mixup=0.0, fliplr=0.5, hsv_h=0.015,
               hsv_s=0.7, hsv_v=0.4, degrees=0.0, translate=0.1,
               scale=0.5, shear=0.0)          # hyp.scratch-low.yaml
    optimizer = dict(lr0=0.01, lrf=0.01, momentum=0.937,
                     weight_decay=0.0005, warmup_epochs=3.0,
                     warmup_momentum=0.8, warmup_bias_lr=0.1,
                     cos_lr=False)
    loss = dict(box=0.05, cls=0.5, obj=1.0, anchor_t=4.0)
    load_from = None                          # converted yolov5 ckpt dir
    bf16 = False                              # amp-style mixed precision
    total_epochs = 300
"""

from __future__ import annotations

import argparse
import functools
import glob
import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import ShardedSampler
from ..data.yolo_aug import (YoloAugHyp, augment_sample,
                             augment_seg_sample, segments2boxes)
from ..losses.yolo import YoloHyp
from ..metrics.detection import detection_map, segmentation_map
from ..models.yolo import (TTA_SCALES, YoloConfig, YoloV5, clip_augmented,
                           decode_predictions, descale_pred, postprocess,
                           postprocess_seg, scale_img)
from ..train.resume import (latest_checkpoint, load_train_state,
                            save_train_state)
from ..train.yolo_trainer import (
    YoloOptHyp, YoloTrainState, init_yolo_train_state, letterbox,
    letterbox_boxes, lr_momentum_at, make_yolo_train_step,
    scaled_weight_decay)


class YoloDetectionDataset:
    """yolov5 directory layout: image files (jpg/png/npy) + same-stem
    label txts of normalized ``cls cx cy w h`` rows (the format
    MCT/yolov5/utils/dataloaders.py LoadImagesAndLabels reads)."""

    def __init__(self, img_dir: str, label_dir: str):
        exts = ("*.jpg", "*.jpeg", "*.png", "*.bmp", "*.npy")
        self.images = sorted(p for e in exts
                             for p in glob.glob(os.path.join(img_dir, e)))
        if not self.images:
            raise FileNotFoundError(f"no images under {img_dir}")
        self.label_dir = label_dir

    def __len__(self) -> int:
        return len(self.images)

    def labels(self, i: int) -> np.ndarray:
        stem = os.path.splitext(os.path.basename(self.images[i]))[0]
        lpath = os.path.join(self.label_dir, stem + ".txt")
        boxes = np.zeros((0, 5), np.float32)
        if os.path.exists(lpath):
            rows = [ln.split() for ln in open(lpath) if ln.strip()]
            if rows:
                boxes = np.asarray(rows, np.float32)
        return boxes

    def image(self, i: int) -> np.ndarray:
        """Pixels only — lets callers that parse labels separately (the
        seg pipeline reads polygons) avoid a second label-file parse."""
        path = self.images[i]
        if path.endswith(".npy"):
            img = np.load(path)
        else:
            import cv2
            img = cv2.imread(path)[:, :, ::-1]          # BGR -> RGB
        return np.ascontiguousarray(img, np.uint8)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.image(i), self.labels(i)

    def shapes_and_labels(self) -> Tuple[np.ndarray, List[np.ndarray]]:
        """Per-image (h, w) + label rows without decoding pixels
        (the reference caches these at dataset init for AutoAnchor)."""
        shapes, labels = [], []
        for i, path in enumerate(self.images):
            if path.endswith(".npy"):
                shapes.append(np.load(path, mmap_mode="r").shape[:2])
            else:
                # header-only read (PIL is lazy): AutoAnchor calls this
                # for the whole dataset, so full decodes are O(dataset).
                # EXIF orientations 5-8 all transpose the delivered
                # pixels, and cv2.imread applies EVERY orientation —
                # so swap w/h for all four, not just the 6/8 pair the
                # reference's exif_size handles (dataloaders.py:60-67)
                from PIL import Image
                with Image.open(path) as im:
                    w, h = im.size
                    try:
                        rot = (im.getexif() or {}).get(274)  # Orientation
                    except Exception:
                        rot = None
                    if rot in (5, 6, 7, 8):
                        w, h = h, w
                shapes.append((h, w))
            labels.append(self.labels(i))
        return np.asarray(shapes, np.float64), labels


class YoloSegDataset(YoloDetectionDataset):
    """yolov5-seg label format: per-image txt rows
    ``cls x1 y1 x2 y2 ...`` — a normalized polygon per instance
    (utils/dataloaders.py verify_image_label segment branch).  Boxes
    derive from the polygon extents (segments2boxes), so AutoAnchor and
    the detection criterion reuse the base-class surface."""

    def segments(self, i: int) -> List[Tuple[float, np.ndarray]]:
        stem = os.path.splitext(os.path.basename(self.images[i]))[0]
        lpath = os.path.join(self.label_dir, stem + ".txt")
        out: List[Tuple[float, np.ndarray]] = []
        if os.path.exists(lpath):
            for ln in open(lpath):
                v = ln.split()
                if len(v) > 5:
                    out.append((float(v[0]),
                                np.asarray(v[1:], np.float32).reshape(-1, 2)))
        return out

    def labels(self, i: int) -> np.ndarray:
        return segments2boxes(self.segments(i))


def rasterize_segments(segments: List[np.ndarray], img_size: int,
                       ratio: int = 1) -> np.ndarray:
    """(n, H/ratio, W/ratio) float binary masks from pixel-space
    polygons.  Fills at full image resolution, then nearest-downsamples
    by `ratio` — the reference's polygon2mask order
    (utils/segment/general.py: fillPoly at img_size, cv2 INTER_NEAREST
    resize to size//ratio), which keeps boundary inflation at the fill
    resolution instead of the mask resolution."""
    import cv2
    out = np.zeros((len(segments), img_size, img_size), np.float32)
    for k, pts in enumerate(segments):
        cv2.fillPoly(out[k], [np.round(pts).astype(np.int32)], 1.0)
    return out[:, ::ratio, ::ratio]


def yolo_seg_batches(ds: YoloSegDataset, batch_size: int, img_size: int,
                     max_targets: int, mask_ratio: int = 4,
                     aug: Optional[YoloAugHyp] = None,
                     rng: Optional[np.random.RandomState] = None,
                     order=None) -> Iterator:
    """(images, targets (B,T,5), valid, gt_masks (B,T,Hm,Wm), n_real).

    With `aug` the full segment pipeline runs (data/yolo_aug.py
    augment_seg_sample: polygon-aware mosaic/mixup/perspective + HSV +
    flips — utils/segment/dataloaders.py __getitem__); without it,
    plain letterbox (the val path).  Polygons ride the geometry and
    rasterize at img_size/mask_ratio (the reference trains with
    --mask-ratio 4, matching the stride-4 prototype maps).

    Masks are per-instance (B, T, Hm, Wm) — the reference's
    ``--no-overlap`` mode (polygons2masks).  Its default overlap
    encoding (one (Hm, Wm) index map, polygons2masks_overlap) is a
    memory optimization for dynamic-shape torch batches; with the
    static T=max_targets budget here the per-instance layout costs the
    same and keeps the criterion's per-target gather trivial.
    """
    order = list(order if order is not None else range(len(ds)))
    mh = mw = img_size // mask_ratio

    def load(j):
        return ds.image(j), ds.segments(j)

    for i in range(0, len(order), batch_size):
        sel = order[i:i + batch_size]
        n = len(sel)
        while len(sel) < batch_size:
            sel.append(sel[0])
        imgs, tgts, valids, masks = [], [], [], []
        for j in sel:
            if aug is not None and rng is not None:
                img, boxes, polys = augment_seg_sample(
                    load, j, len(ds), img_size, aug, rng)
            else:
                img = ds.image(j)
                segs = ds.segments(j)
                hw = img.shape[:2]
                img, r, pad = letterbox(img, img_size)
                # polygons in letterboxed pixels
                polys = [p * np.asarray([hw[1], hw[0]]) * r
                         + np.asarray(pad) for _, p in segs]
                boxes = segments2boxes(
                    [(c, q / img_size)
                     for (c, _), q in zip(segs, polys)])
            gm = rasterize_segments(polys, img_size, mask_ratio)
            t = np.zeros((max_targets, 5), np.float32)
            v = np.zeros((max_targets,), bool)
            m = np.zeros((max_targets, mh, mw), np.float32)
            k = min(len(boxes), max_targets)
            t[:k] = boxes[:k]
            v[:k] = True
            m[:k] = gm[:k]
            imgs.append(np.ascontiguousarray(img))
            tgts.append(t)
            valids.append(v)
            masks.append(m)
        yield (jnp.asarray(np.stack(imgs), jnp.float32) / 255.0,
               jnp.asarray(np.stack(tgts)), jnp.asarray(np.stack(valids)),
               jnp.asarray(np.stack(masks)), n)


def yolo_batches(ds: YoloDetectionDataset, batch_size: int, img_size: int,
                 max_targets: int, aug: Optional[YoloAugHyp] = None,
                 rng: Optional[np.random.RandomState] = None,
                 order=None) -> Iterator:
    """(images f32 0-1, targets (B,T,5), valid (B,T), n_real).

    With `aug` set, each sample runs the full reference train pipeline
    (mosaic / mixup / random_perspective / HSV / flips —
    data/yolo_aug.py augment_sample); without it, the val-style
    letterbox-only path."""
    order = list(order if order is not None else range(len(ds)))
    for i in range(0, len(order), batch_size):
        sel = order[i:i + batch_size]
        n = len(sel)
        while len(sel) < batch_size:
            sel.append(sel[0])
        imgs, tgts, valids = [], [], []
        for j in sel:
            if aug is not None:
                img, boxes = augment_sample(ds.__getitem__, j, len(ds),
                                            img_size, aug, rng)
            else:
                img, boxes = ds[j]
                hw = img.shape[:2]
                img, r, pad = letterbox(img, img_size)
                boxes = letterbox_boxes(boxes, r, pad, hw, img_size)
            t = np.zeros((max_targets, 5), np.float32)
            v = np.zeros((max_targets,), bool)
            k = min(len(boxes), max_targets)
            t[:k] = boxes[:k]
            v[:k] = True
            imgs.append(img)
            tgts.append(t)
            valids.append(v)
        yield (jnp.asarray(np.stack(imgs), jnp.float32) / 255.0,
               jnp.asarray(np.stack(tgts)), jnp.asarray(np.stack(valids)), n)


def build_yolo_model(cfg: Config) -> YoloV5:
    mcfg = dict(cfg.get("model", {}))
    mcfg.pop("type", None)
    anchors = mcfg.pop("anchors", None)
    kw = dict(num_classes=mcfg.get("num_classes", 80),
              depth_multiple=mcfg.get("depth_multiple", 0.33),
              width_multiple=mcfg.get("width_multiple", 0.50),
              img_size=mcfg.get("img_size", 640),
              masks=mcfg.get("masks", 0),
              protos=mcfg.get("protos", 0))
    if anchors is not None:
        kw["anchors"] = tuple(tuple(tuple(a) for a in layer)
                              for layer in anchors)
    return YoloV5(YoloConfig(**kw))


@functools.lru_cache(maxsize=8)
def _det_infer(model: YoloV5):
    """One compiled eval forward per model (flax modules hash by config).
    A per-call jit(lambda) would re-trace/re-compile every eval epoch —
    20s-9min per compile through the remote TPU service."""
    return jax.jit(lambda p, s, x: decode_predictions(
        model.apply({"params": p, "batch_stats": s}, x, train=False),
        model.cfg))


@functools.lru_cache(maxsize=8)
def _det_infer_tta(model: YoloV5):
    """Augmented inference (reference models/yolo.py:212-223
    _forward_augment behind val.py --augment): 3 scale/flip passes, each
    decoded on its own grid, de-scaled to the original frame, tails
    clipped, concatenated.  The scale ratios/flips are Python constants,
    so ONE jit traces all three passes plus the descale/clip/concat tail
    into a single compiled program — running the tail eagerly would cost
    ~25-30 relay dispatches (~30ms each) per eval batch."""
    size = model.cfg.img_size

    def infer(p, s, images):
        ys = []
        for ratio, flip in TTA_SCALES:
            xi = images[:, :, ::-1, :] if flip == 3 else images
            xi = scale_img(xi, ratio)
            yi = decode_predictions(
                model.apply({"params": p, "batch_stats": s}, xi,
                            train=False), model.cfg)
            ys.append(descale_pred(yi, flip, ratio, (size, size)))
        return jnp.concatenate(clip_augmented(ys), axis=1)

    return jax.jit(infer)


@functools.lru_cache(maxsize=8)
def _seg_infer(model: YoloV5):
    def fwd(p, s, x):
        maps, proto = model.apply({"params": p, "batch_stats": s}, x,
                                  train=False)
        return decode_predictions(maps, model.cfg), proto
    return jax.jit(fwd)


def evaluate_detector(model: YoloV5, params, stats,
                      batches: Iterator, conf_thres: float = 0.001,
                      iou_thres: float = 0.6, augment: bool = False) -> Dict:
    """val.py-equivalent: decode + NMS the (EMA) detector, COCO mAP.
    augment=True runs scale/flip TTA (val.py --augment)."""
    infer = _det_infer_tta(model) if augment else _det_infer(model)
    preds_all: List[Dict] = []
    gts_all: List[Dict] = []
    size = float(model.cfg.img_size)
    for images, targets, valid, n in batches:
        preds = np.asarray(infer(params, stats, images))
        dets = postprocess(preds, conf_thres, iou_thres,
                           multi_label=True)   # val.py protocol
        tn = np.asarray(targets)
        vn = np.asarray(valid)
        for b in range(n):
            d = dets[b]
            preds_all.append(dict(boxes=d[:, :4], scores=d[:, 4],
                                  classes=d[:, 5].astype(int)))
            rows = tn[b][vn[b]]
            xy, wh = rows[:, 1:3] * size, rows[:, 3:5] * size
            gts_all.append(dict(
                boxes=np.concatenate([xy - wh / 2, xy + wh / 2], 1),
                classes=rows[:, 0].astype(int)))
    return detection_map(preds_all, gts_all)


def evaluate_segmenter(model: YoloV5, params, stats, batches: Iterator,
                       conf_thres: float = 0.001, iou_thres: float = 0.6,
                       mask_ratio: int = 4) -> Dict:
    """segment/val.py-equivalent: decode + seg NMS + process_mask, then
    box AND mask mAP (metrics.detection.segmentation_map).  GT masks
    arrive at prototype resolution and are bilinear-upsampled + 0.5
    thresholded to image size for the mask IoU (the reference's
    --mask-ratio round trip, segment/val.py:161)."""
    import cv2

    infer = _seg_infer(model)
    preds_all: List[Dict] = []
    gts_all: List[Dict] = []
    size = model.cfg.img_size
    for images, targets, valid, gt_masks, n in batches:
        preds, proto = infer(params, stats, images)
        outs = postprocess_seg(np.asarray(preds), np.asarray(proto),
                               (size, size), conf_thres, iou_thres,
                               multi_label=True)   # segment/val.py
        tn, vn = np.asarray(targets), np.asarray(valid)
        gmn = np.asarray(gt_masks)
        for b in range(n):
            det, masks = outs[b]
            preds_all.append(dict(boxes=det[:, :4], scores=det[:, 4],
                                  classes=det[:, 5].astype(int),
                                  masks=masks))
            rows = tn[b][vn[b]]
            xy, wh = rows[:, 1:3] * size, rows[:, 3:5] * size
            gm = gmn[b][vn[b]]
            # bilinear upsample + 0.5 threshold (segment/val.py:161
            # F.interpolate(mode="bilinear").gt_(0.5))
            gm_up = (np.stack([cv2.resize(m, (size, size),
                                          interpolation=cv2.INTER_LINEAR)
                               for m in gm], 0) > 0.5
                     if len(gm) else np.zeros((0, size, size), bool))
            gts_all.append(dict(
                boxes=np.concatenate([xy - wh / 2, xy + wh / 2], 1),
                classes=rows[:, 0].astype(int), masks=gm_up))
    return segmentation_map(preds_all, gts_all)


def train_from_config(cfg: Config, work_dir: str,
                      resume: Optional[str] = None,
                      num_epochs: Optional[int] = None):
    model = build_yolo_model(cfg)
    seg = model.cfg.masks > 0
    img_size = model.cfg.img_size
    bs = cfg.get("data.batch_size", 16)
    max_t = cfg.get("data.max_targets", 64)
    mask_ratio = cfg.get("data.mask_ratio", 4)
    aug = YoloAugHyp(**cfg.get("aug", {}))

    ds_cls = YoloSegDataset if seg else YoloDetectionDataset
    train_ds = ds_cls(cfg["data.train.img_dir"],
                      cfg["data.train.label_dir"])
    val_ds = None
    if cfg.get("data.val"):
        val_ds = ds_cls(cfg["data.val.img_dir"],
                        cfg["data.val.label_dir"])

    hyp = YoloHyp(**cfg.get("loss", {}))
    opt = YoloOptHyp(**cfg.get("optimizer", {}))

    if cfg.get("autoanchor", True) and not resume:
        # train.py:223-225 AutoAnchor pass (reference default-on)
        import dataclasses
        from ..utils.autoanchor import check_anchors
        shapes, labs = train_ds.shapes_and_labels()
        new_anchors, bpr, changed = check_anchors(
            shapes, labs, model.cfg.anchors, thr=hyp.anchor_t,
            img_size=img_size, gen=cfg.get("autoanchor_gen", 1000))
        if changed:
            print(json.dumps({"autoanchor": [list(map(list, l))
                                             for l in new_anchors],
                              "bpr": bpr}))
            model = YoloV5(dataclasses.replace(model.cfg,
                                               anchors=new_anchors))

    wd = scaled_weight_decay(opt, bs)
    bf16 = cfg.get("bf16", False)   # mixed-precision step (amp autocast)
    step = make_yolo_train_step(model, hyp, opt, wd, bf16=bf16,
                                mask_cap=cfg.get("loss_mask_cap", 128))
    state = init_yolo_train_state(model, jax.random.key(0), img_size, bs)

    load_from = cfg.get("load_from")
    if load_from and not resume:
        # start from imported yolov5 weights (train.py `--weights`
        # semantics; cli/convert_checkpoint --type yolov5 output)
        from ..train.checkpoint import load_checkpoint
        variables, _, _ = load_checkpoint(
            load_from, {"params": state.params,
                        "batch_stats": state.batch_stats})
        state = state._replace(params=variables["params"],
                               batch_stats=variables["batch_stats"],
                               ema_params=variables["params"],
                               ema_stats=variables["batch_stats"])

    start_epoch = 0
    best = -1.0
    if resume:
        payload, loop = load_train_state(resume, {"state": tuple(state)})
        state = YoloTrainState(*payload["state"])
        start_epoch = int(loop.get("epoch", -1)) + 1
        # restore the best fitness so a post-resume eval can't overwrite
        # work_dir/best with a worse score
        best = float(loop.get("best", -1.0))
        if loop.get("anchors"):
            # AutoAnchor result persists across resume (the reference
            # keeps evolved anchors inside the model checkpoint)
            import dataclasses
            anchors = tuple(tuple(tuple(a) for a in layer)
                            for layer in loop["anchors"])
            if anchors != model.cfg.anchors:
                model = YoloV5(dataclasses.replace(model.cfg,
                                                   anchors=anchors))
                step = make_yolo_train_step(
                    model, hyp, opt, wd, bf16=bf16,
                    mask_cap=cfg.get("loss_mask_cap", 128))

    epochs = num_epochs or cfg.get("total_epochs", 300)
    eval_interval = cfg.get("eval_interval", 1)
    nb = max(1, (len(train_ds) + bs - 1) // bs)
    sampler = ShardedSampler(len(train_ds), shuffle=True)
    aug_rng = np.random.RandomState(0)
    history: List[Dict] = []
    for epoch in range(start_epoch, epochs):
        losses = []
        if seg:
            batches = yolo_seg_batches(train_ds, bs, img_size, max_t,
                                       mask_ratio, aug, aug_rng,
                                       sampler.indices(epoch))
        else:
            batches = yolo_batches(train_ds, bs, img_size, max_t, aug,
                                   aug_rng, sampler.indices(epoch))
        for bi, (images, targets, valid, *rest) in enumerate(batches):
            gt_masks = rest[0] if seg else None
            ni = bi + nb * epoch
            lr_b, lr_r, mom = lr_momentum_at(ni, epoch, nb, epochs, opt)
            state, logs = step(state, images, targets, valid,
                               lr_b, lr_r, mom, gt_masks=gt_masks)
            losses.append(float(logs["loss"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses))}
        if val_ds is not None and (epoch + 1) % eval_interval == 0:
            if seg:
                report = evaluate_segmenter(
                    model, state.ema_params, state.ema_stats,
                    yolo_seg_batches(val_ds, bs, img_size, max_t,
                                     mask_ratio),
                    mask_ratio=mask_ratio)
                rec["map50"] = report["boxes"]["map50"]
                rec["map"] = report["boxes"]["map"]
                rec["mask_map50"] = report["masks"]["map50"]
                rec["mask_map"] = report["masks"]["map"]
                # segment/train.py fitness: 0.1*mAP50 + 0.9*mAP,
                # averaged over the box and mask branches
                score = float(np.mean(
                    [0.1 * report[k]["map50"] + 0.9 * report[k]["map"]
                     for k in ("boxes", "masks")]))
            else:
                report = evaluate_detector(
                    model, state.ema_params, state.ema_stats,
                    yolo_batches(val_ds, bs, img_size, max_t))
                rec["map50"] = report["map50"]
                rec["map"] = report["map"]
                # train.py fitness: 0.1*mAP@0.5 + 0.9*mAP@0.5:0.95
                score = 0.1 * report["map50"] + 0.9 * report["map"]
            if score > best:
                best = score
                save_train_state(os.path.join(work_dir, "best"),
                                 {"params": state.ema_params,
                                  "batch_stats": state.ema_stats},
                                 {"epoch": epoch, "fitness": best,
                                  "model": dict(cfg.get("model", {})),
                                  "anchors": [list(map(list, l))
                                              for l in model.cfg.anchors]})
        save_train_state(os.path.join(work_dir, f"epoch_{epoch}"),
                         {"state": tuple(state)},
                         {"epoch": epoch, "best": best,
                          "anchors": [list(map(list, l))
                                      for l in model.cfg.anchors]})
        history.append(rec)
        print(json.dumps(rec))
    return state, history


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("--work_dir", default="work_dirs/yolo")
    parser.add_argument("--resume", nargs="?", const="latest", default=None)
    parser.add_argument("--total_epochs", type=int, default=None)
    parser.add_argument("--cfg-options", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    os.makedirs(args.work_dir, exist_ok=True)
    resume = args.resume
    if resume == "latest":
        resume = latest_checkpoint(args.work_dir)
    train_from_config(cfg, args.work_dir, resume, args.total_epochs)


if __name__ == "__main__":
    main()
