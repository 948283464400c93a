"""Config-driven yolov5-cls classification training CLI.

The MCT/yolov5/classify/train.py surface: directory-per-class image
folders, RandomResizedCrop+flip train transforms vs CenterCrop eval
transforms (utils/augmentations.py classify_albumentations:305-345 /
classify_transforms:347-352), label-smoothed CE with the smart_optimizer
group numerics (train/yolo_trainer.py::make_yolo_cls_train_step), the
linear epoch lr schedule (classify/train.py:146-149
``lf = (1 - x/epochs) * (1 - lrf) + lrf``), EMA weights, and
top-1-accuracy save-best ("fitness = top1", classify/train.py:209-219).

    python -m cross_modal_video_engine_tpu.cli.yolo_cls_train CONFIG \\
        --work_dir work/yolo_cls [--resume [PATH]] [--total_epochs N]

Dataset layout (torchvision ImageFolder, what the reference's
ClassificationDataset wraps): ``root/train/<class>/*.jpg`` and
``root/val/<class>/*.jpg`` (npy accepted for fixtures).
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
from ..models.yolo import YoloClassifier, YoloConfig
from ..train.resume import (latest_checkpoint, load_train_state,
                            save_train_state)
from ..train.yolo_trainer import (YoloOptHyp, YoloTrainState,
                                  make_yolo_cls_train_step)

# classify normalization constants (utils/augmentations.py:52-53)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ImageFolderDataset:
    """Directory-per-class layout (torchvision ImageFolder semantics;
    classes sorted by name -> contiguous ids).

    ``classes`` imposes an existing name->id mapping (pass the TRAIN
    split's classes when building the val split: a val tree missing a
    class would otherwise shift every later id and silently score
    against the wrong classes)."""

    def __init__(self, root: str, classes: Optional[List[str]] = None):
        found = sorted(d for d in os.listdir(root)
                       if os.path.isdir(os.path.join(root, d)))
        if not found:
            raise FileNotFoundError(f"no class dirs under {root}")
        if classes is None:
            self.classes = found
        else:
            unknown = sorted(set(found) - set(classes))
            if unknown:
                raise ValueError(
                    f"classes {unknown} under {root} not in the "
                    f"imposed mapping {classes}")
            self.classes = list(classes)
        class_to_id = {c: i for i, c in enumerate(self.classes)}
        exts = ("*.jpg", "*.jpeg", "*.png", "*.bmp", "*.npy")
        self.samples: List[Tuple[str, int]] = []
        for cname in found:
            ci = class_to_id[cname]
            for e in exts:
                for p in sorted(glob.glob(os.path.join(root, cname, e))):
                    self.samples.append((p, ci))
        if not self.samples:
            raise FileNotFoundError(f"no images under {root}/<class>/")

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        path, label = self.samples[i]
        if path.endswith(".npy"):
            img = np.load(path)
        else:
            import cv2
            img = cv2.imread(path)[:, :, ::-1]
        return np.ascontiguousarray(img, np.uint8), label


def random_resized_crop(img: np.ndarray, size: int,
                        rng: np.random.RandomState,
                        scale=(0.08, 1.0),
                        ratio=(3 / 4, 4 / 3)) -> np.ndarray:
    """RandomResizedCrop (the albumentations/torchvision op the
    reference trains with, classify_albumentations:323): sample an
    area/aspect crop (10 tries, then center fallback), resize to
    size²."""
    import cv2
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        cw = int(round(np.sqrt(target * np.exp(log_r))))
        ch = int(round(np.sqrt(target / np.exp(log_r))))
        if 0 < cw <= w and 0 < ch <= h:
            x = rng.randint(0, w - cw + 1)
            y = rng.randint(0, h - ch + 1)
            crop = img[y:y + ch, x:x + cw]
            return cv2.resize(crop, (size, size),
                              interpolation=cv2.INTER_LINEAR)
    return center_crop(img, size)


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Eval transform (utils/augmentations.py CenterCrop:375-385):
    crop the min dimension centrally, resize to size²."""
    import cv2
    h, w = img.shape[:2]
    m = min(h, w)
    top, left = (h - m) // 2, (w - m) // 2
    return cv2.resize(img[top:top + m, left:left + m], (size, size),
                      interpolation=cv2.INTER_LINEAR)


def _normalize(batch: np.ndarray) -> jnp.ndarray:
    """uint8 -> /255 -> imagenet mean/std (ToTensor + Normalize)."""
    x = batch.astype(np.float32) / 255.0
    return jnp.asarray((x - IMAGENET_MEAN) / IMAGENET_STD)


def cls_batches(ds: ImageFolderDataset, batch_size: int, size: int,
                augment: bool, rng: Optional[np.random.RandomState] = None,
                fliplr: float = 0.5, order=None) -> Iterator:
    """(images (B,S,S,3) normalized f32, labels (B,), n_real); the tail
    batch pads by repetition like the detection loader."""
    order = list(order if order is not None else range(len(ds)))
    for i in range(0, len(order), batch_size):
        sel = order[i:i + batch_size]
        n = len(sel)
        while len(sel) < batch_size:
            sel.append(sel[0])
        imgs, labels = [], []
        for j in sel:
            img, lab = ds[j]
            if augment and rng is not None:
                img = random_resized_crop(img, size, rng)
                if rng.rand() < fliplr:
                    img = img[:, ::-1]
            else:
                img = center_crop(img, size)
            imgs.append(np.ascontiguousarray(img))
            labels.append(lab)
        yield (_normalize(np.stack(imgs)),
               jnp.asarray(np.asarray(labels, np.int32)), n)


@functools.lru_cache(maxsize=8)
def _cls_infer(model: YoloClassifier):
    """One compiled eval forward per model (a per-call jit closure
    would recompile every eval epoch — see cli/yolo_train._det_infer)."""
    return jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x, train=False))


def evaluate_classifier(model: YoloClassifier, params, stats,
                        batches: Iterator) -> Dict[str, float]:
    """classify/val.py: top-1 / top-5 over the eval transform."""
    infer = _cls_infer(model)
    top1 = top5 = total = 0
    for images, labels, n in batches:
        logits = np.asarray(infer(params, stats, images))[:n]
        lab = np.asarray(labels)[:n]
        k = min(5, logits.shape[-1])
        topk = np.argsort(-logits, axis=-1)[:, :k]
        top1 += int((topk[:, 0] == lab).sum())
        top5 += int((topk == lab[:, None]).any(1).sum())
        total += n
    return {"top1": top1 / max(total, 1), "top5": top5 / max(total, 1)}


def build_cls_model(cfg: Config) -> YoloClassifier:
    mcfg = cfg.get("model", {})
    return YoloClassifier(YoloConfig(
        num_classes=mcfg.get("num_classes", 1000),
        depth_multiple=mcfg.get("depth_multiple", 0.33),
        width_multiple=mcfg.get("width_multiple", 0.50),
        img_size=mcfg.get("img_size", 224)))


def init_cls_train_state(model: YoloClassifier, rng, size: int,
                         batch: int) -> YoloTrainState:
    variables = model.init(rng, jnp.zeros((batch, size, size, 3)),
                           train=False)
    params, stats = variables["params"], variables["batch_stats"]
    vel = jax.tree_util.tree_map(jnp.zeros_like, params)
    return YoloTrainState(params, stats, vel, params, stats,
                          jnp.zeros((), jnp.int32))


def train_from_config(cfg: Config, work_dir: str,
                      resume: Optional[str] = None,
                      num_epochs: Optional[int] = None):
    model = build_cls_model(cfg)
    size = model.cfg.img_size
    bs = cfg.get("data.batch_size", 64)
    opt = YoloOptHyp(**cfg.get("optimizer", {}))
    lrf = cfg.get("lrf", 0.01)
    fliplr = cfg.get("aug.fliplr", 0.5)

    train_ds = ImageFolderDataset(cfg["data.train_dir"])
    # val reuses the TRAIN class mapping (ids must align with the head)
    val_ds = (ImageFolderDataset(cfg["data.val_dir"], train_ds.classes)
              if cfg.get("data.val_dir") else None)

    step = make_yolo_cls_train_step(
        model, opt, weight_decay=cfg.get("weight_decay", 5e-5),
        label_smoothing=cfg.get("label_smoothing", 0.1),
        bf16=cfg.get("bf16", False))
    state = init_cls_train_state(model, jax.random.key(0), size, bs)

    load_from = cfg.get("load_from")
    if load_from and not resume:
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

    epochs = num_epochs or cfg.get("total_epochs", 10)
    eval_interval = cfg.get("eval_interval", 1)
    rng = np.random.RandomState(0)
    history: List[Dict] = []
    for epoch in range(start_epoch, epochs):
        # linear schedule, stepped per epoch (classify/train.py:148)
        lr = opt.lr0 * ((1 - epoch / epochs) * (1 - lrf) + lrf)
        order = rng.permutation(len(train_ds))
        losses, accs = [], []
        for images, labels, _n in cls_batches(train_ds, bs, size, True,
                                              rng, fliplr, order):
            state, logs = step(state, images, labels, lr, lr, 0.9)
            losses.append(float(logs["loss"]))
            accs.append(float(logs["acc"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "acc": float(np.mean(accs)), "lr": lr}
        if val_ds is not None and (epoch + 1) % eval_interval == 0:
            report = evaluate_classifier(
                model, state.ema_params, state.ema_stats,
                cls_batches(val_ds, bs, size, False))
            rec.update(report)
            if report["top1"] > best:   # fitness = top1 (:209-219)
                best = report["top1"]
                save_train_state(os.path.join(work_dir, "best"),
                                 {"params": state.ema_params,
                                  "batch_stats": state.ema_stats},
                                 {"epoch": epoch, "top1": best,
                                  "classes": train_ds.classes,
                                  "model": dict(cfg.get("model", {}))})
        save_train_state(os.path.join(work_dir, f"epoch_{epoch}"),
                         {"state": tuple(state)},
                         {"epoch": epoch, "best": best})
        history.append(rec)
        print(json.dumps(rec))
    return state, history


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("--work_dir", default="work_dirs/yolo_cls")
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
