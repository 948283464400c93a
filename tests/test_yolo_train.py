"""End-to-end YOLOv5 training: schedule/EMA/optimizer-group units plus
a tiny config-driven run whose loss decreases and whose val mAP is
computed (the MCT/yolov5/train.py + val.py surface)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_modal_video_engine_tpu.config import Config
from cross_modal_video_engine_tpu.cli.yolo_train import (
    YoloDetectionDataset, build_yolo_model, train_from_config, yolo_batches)
from cross_modal_video_engine_tpu.losses.yolo import YoloHyp
from cross_modal_video_engine_tpu.models.yolo import YoloConfig, YoloV5
from cross_modal_video_engine_tpu.train.yolo_trainer import (
    YoloOptHyp, _group_of, init_yolo_train_state, letterbox,
    letterbox_boxes, lr_momentum_at, make_yolo_train_step,
    scaled_weight_decay)

TINY = dict(num_classes=2, depth_multiple=0.33, width_multiple=0.125,
            img_size=64)


def _synthetic_dataset(root, n=6, nc=2, img=64, seed=0):
    """White boxes on dark noise — learnable objectness signal."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    for i in range(n):
        arr = rng.randint(0, 40, (img, img, 3)).astype(np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        w = h = rng.uniform(0.25, 0.45)
        cls = i % nc
        x1, y1 = int((cx - w / 2) * img), int((cy - h / 2) * img)
        x2, y2 = int((cx + w / 2) * img), int((cy + h / 2) * img)
        val = 220 if cls == 0 else 120
        arr[y1:y2, x1:x2] = val
        np.save(os.path.join(img_dir, f"im{i}.npy"), arr)
        with open(os.path.join(lbl_dir, f"im{i}.txt"), "w") as f:
            f.write(f"{cls} {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}\n")
    return img_dir, lbl_dir


def test_param_groups():
    assert _group_of(("stem", "conv", "kernel")) == 0
    assert _group_of(("stem", "bn", "scale")) == 1
    assert _group_of(("stem", "bn", "bias")) == 2
    assert _group_of(("detect_0", "bias")) == 2


def test_schedule_matches_reference_interp():
    opt = YoloOptHyp(lr0=0.01, lrf=0.01, warmup_epochs=3.0)
    nb, epochs = 100, 10
    nw = max(round(3.0 * nb), 100)  # = 300
    # start of warmup: bias lr at warmup_bias_lr, rest at 0, mom at 0.8
    lr_b, lr_r, mom = lr_momentum_at(0, 0, nb, epochs, opt)
    assert lr_b == pytest.approx(0.1)
    assert lr_r == pytest.approx(0.0)
    assert mom == pytest.approx(0.8)
    # end of warmup: all at lr0*lf(epoch), momentum at nominal
    epoch_at_nw = nw // nb
    lf = (1 - epoch_at_nw / epochs) * (1 - opt.lrf) + opt.lrf
    lr_b, lr_r, mom = lr_momentum_at(nw, epoch_at_nw, nb, epochs, opt)
    assert lr_b == pytest.approx(0.01 * lf)
    assert lr_r == pytest.approx(0.01 * lf)
    assert mom == pytest.approx(0.937)
    # past warmup, linear decay to lr0*lrf at the final epoch
    lr_b, _, _ = lr_momentum_at(nb * epochs, epochs - 1, nb, epochs, opt)
    assert lr_b == pytest.approx(
        0.01 * ((1 - (epochs - 1) / epochs) * (1 - 0.01) + 0.01))


def test_weight_decay_scaling():
    opt = YoloOptHyp(weight_decay=0.0005)
    # batch 64 -> nominal; batch 16 -> accumulate 4 -> unchanged
    assert scaled_weight_decay(opt, 64) == pytest.approx(0.0005)
    assert scaled_weight_decay(opt, 16) == pytest.approx(0.0005)
    # batch 128 -> accumulate 1 -> doubles
    assert scaled_weight_decay(opt, 128) == pytest.approx(0.001)


def test_letterbox_box_geometry():
    img = np.zeros((32, 64, 3), np.uint8)
    out, r, pad = letterbox(img, 64)
    assert out.shape == (64, 64, 3)
    assert r == pytest.approx(1.0)
    boxes = np.array([[0, 0.5, 0.5, 0.5, 0.5]], np.float32)
    mapped = letterbox_boxes(boxes, r, pad, (32, 64), 64)
    # x centered stays 0.5; y center moves to the padded middle
    assert mapped[0, 1] == pytest.approx(0.5)
    assert mapped[0, 2] == pytest.approx(0.5)
    assert mapped[0, 3] == pytest.approx(0.5)       # w: 32px / 64
    assert mapped[0, 4] == pytest.approx(0.25)      # h: 16px / 64


@pytest.mark.full    # full lane: step-level; the det CLI e2e drives the same step default
def test_train_step_decreases_loss_and_updates_ema():
    model = YoloV5(YoloConfig(**TINY))
    state = init_yolo_train_state(model, jax.random.key(0), 64, 2)
    hyp = YoloHyp()
    opt = YoloOptHyp(lr0=0.01, warmup_epochs=0.0)
    step = make_yolo_train_step(model, hyp, opt,
                                scaled_weight_decay(opt, 2))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    targets = np.zeros((2, 4, 5), np.float32)
    targets[0, 0] = [0, 0.4, 0.4, 0.3, 0.3]
    targets[1, 0] = [1, 0.6, 0.6, 0.35, 0.3]
    valid = np.zeros((2, 4), bool)
    valid[:, 0] = True
    targets, valid = jnp.asarray(targets), jnp.asarray(valid)

    losses = []
    for i in range(12):
        state, logs = step(state, images, targets, valid, 0.01, 0.01, 0.9)
        losses.append(float(logs["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.updates) == 12
    # EMA trails the live params but has moved off init
    d0 = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree_util.tree_map(lambda a, b: a - b,
                               state.ema_params, state.params), 0.0)
    assert d0 > 0.0


@pytest.mark.full    # full lane: bf16 A/B probe; CLI e2es drive the train step default and recognition bf16 numerics are pinned in test_bf16_train_step
def test_train_step_bf16_mixed_precision():
    """bf16=True: fwd+bwd in bfloat16, master weights stay f32, loss
    still decreases (the production setting benched in bench_extra)."""
    model = YoloV5(YoloConfig(**TINY))
    state = init_yolo_train_state(model, jax.random.key(0), 64, 2)
    opt = YoloOptHyp(lr0=0.01, warmup_epochs=0.0)
    step = make_yolo_train_step(model, YoloHyp(), opt,
                                scaled_weight_decay(opt, 2), bf16=True)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    targets = np.zeros((2, 4, 5), np.float32)
    targets[0, 0] = [0, 0.4, 0.4, 0.3, 0.3]
    targets[1, 0] = [1, 0.6, 0.6, 0.35, 0.3]
    valid = np.zeros((2, 4), bool)
    valid[:, 0] = True
    targets, valid = jnp.asarray(targets), jnp.asarray(valid)

    losses = []
    for _ in range(12):
        state, logs = step(state, images, targets, valid, 0.01, 0.01, 0.9)
        losses.append(float(logs["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] * 0.95, losses
    # master weights, velocity and EMA remain full precision
    for leaf in jax.tree_util.tree_leaves(
            (state.params, state.vel, state.ema_params)):
        assert leaf.dtype == jnp.float32


def test_cli_e2e_loss_decreases_and_eval_runs(tmp_path):
    img_dir, lbl_dir = _synthetic_dataset(str(tmp_path))
    cfg = Config({
        "model": TINY,
        "data": {"train": {"img_dir": img_dir, "label_dir": lbl_dir},
                 "val": {"img_dir": img_dir, "label_dir": lbl_dir},
                 "batch_size": 3, "max_targets": 4},
        # mild, deterministic-ish augmentation so the 4-epoch loss
        # trend stays monotone; the full mosaic/mixup pipeline has its
        # own geometry tests (test_yolo_aug.py)
        "aug": {"mosaic": 0.0, "scale": 0.0, "translate": 0.0,
                "fliplr": 0.5, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0},
        "optimizer": {"lr0": 0.02, "warmup_epochs": 0.0, "cos_lr": True},
        "loss": {},
        "eval_interval": 4,
    })
    work = str(tmp_path / "work")
    os.makedirs(work)
    state, history = train_from_config(cfg, work, num_epochs=4)
    assert history[-1]["loss"] < history[0]["loss"]
    assert "map50" in history[-1]
    assert 0.0 <= history[-1]["map50"] <= 1.0
    # per-epoch resume checkpoints + best (EMA) checkpoint exist
    assert os.path.isdir(os.path.join(work, "epoch_3"))
    # resume restores and continues from the checkpoint
    state2, h2 = train_from_config(
        cfg, work, resume=os.path.join(work, "epoch_3"), num_epochs=5)
    assert h2[0]["epoch"] == 4
    assert np.isfinite(h2[0]["loss"])


def test_dataset_reads_yolov5_layout(tmp_path):
    img_dir, lbl_dir = _synthetic_dataset(str(tmp_path), n=3)
    ds = YoloDetectionDataset(img_dir, lbl_dir)
    assert len(ds) == 3
    img, boxes = ds[0]
    assert img.dtype == np.uint8 and img.shape == (64, 64, 3)
    assert boxes.shape == (1, 5)
    batch = next(yolo_batches(ds, 2, 64, 4,
                              rng=np.random.RandomState(0)))
    images, targets, valid, n = batch
    assert images.shape == (2, 64, 64, 3)
    assert float(images.max()) <= 1.0
    assert targets.shape == (2, 4, 5) and valid.shape == (2, 4)


@pytest.mark.full    # full lane: step-level; the seg CLI e2e drives the same step default
def test_seg_train_step_decreases_loss():
    """Segment variant (cfg.masks>0): step takes gt_masks, the seg item
    is live, loss decreases (segment/train.py surface)."""
    model = YoloV5(YoloConfig(masks=4, protos=32, **TINY))
    state = init_yolo_train_state(model, jax.random.key(0), 64, 2)
    opt = YoloOptHyp(lr0=0.01, warmup_epochs=0.0)
    step = make_yolo_train_step(model, YoloHyp(), opt,
                                scaled_weight_decay(opt, 2), mask_cap=32)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    targets = np.zeros((2, 4, 5), np.float32)
    targets[0, 0] = [0, 0.4, 0.4, 0.3, 0.3]
    targets[1, 0] = [1, 0.6, 0.6, 0.35, 0.3]
    valid = np.zeros((2, 4), bool)
    valid[:, 0] = True
    gt_masks = np.zeros((2, 4, 16, 16), np.float32)
    gt_masks[0, 0, 4:10, 4:10] = 1.0
    gt_masks[1, 0, 8:14, 8:14] = 1.0
    targets, valid = jnp.asarray(targets), jnp.asarray(valid)
    gt_masks = jnp.asarray(gt_masks)

    losses, segs = [], []
    for _ in range(12):
        state, logs = step(state, images, targets, valid, 0.01, 0.01, 0.9,
                           gt_masks=gt_masks)
        losses.append(float(logs["loss"]))
        segs.append(float(logs["seg"]))
        assert np.isfinite(losses[-1])
    assert segs[0] > 0.0
    assert losses[-1] < losses[0] * 0.95, losses
    assert int(logs["seg_dropped"]) == 0


def _synthetic_seg_dataset(root, n=6, nc=2, img=64, seed=0):
    """Same white-box images as _synthetic_dataset, but labels are the
    yolov5-seg polygon rows (`cls x1 y1 x2 y2 ...`, normalized)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    for i in range(n):
        arr = rng.randint(0, 40, (img, img, 3)).astype(np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        w = h = rng.uniform(0.25, 0.45)
        cls = i % nc
        x1, y1 = cx - w / 2, cy - h / 2
        x2, y2 = cx + w / 2, cy + h / 2
        arr[int(y1 * img):int(y2 * img),
            int(x1 * img):int(x2 * img)] = 220 if cls == 0 else 120
        np.save(os.path.join(img_dir, f"im{i}.npy"), arr)
        with open(os.path.join(lbl_dir, f"im{i}.txt"), "w") as f:
            f.write(f"{cls} {x1:.4f} {y1:.4f} {x2:.4f} {y1:.4f} "
                    f"{x2:.4f} {y2:.4f} {x1:.4f} {y2:.4f}\n")
    return img_dir, lbl_dir


def test_seg_dataset_and_batches(tmp_path):
    from cross_modal_video_engine_tpu.cli.yolo_train import (
        YoloSegDataset, yolo_seg_batches)
    img_dir, lbl_dir = _synthetic_seg_dataset(str(tmp_path), n=3)
    ds = YoloSegDataset(img_dir, lbl_dir)
    segs = ds.segments(0)
    assert len(segs) == 1 and segs[0][1].shape == (4, 2)
    boxes = ds.labels(0)      # polygon extents -> cls cx cy w h
    assert boxes.shape == (1, 5)
    images, targets, valid, gt_masks, n = next(
        yolo_seg_batches(ds, 2, 64, 4, mask_ratio=4))
    assert images.shape == (2, 64, 64, 3)
    assert gt_masks.shape == (2, 4, 16, 16)
    # rasterized mask extents match the polygon's box at /4 res
    m = np.asarray(gt_masks)[0, 0]
    t = np.asarray(targets)[0, 0]
    ys, xs = np.nonzero(m)
    cx, cy, w, h = t[1] * 16, t[2] * 16, t[3] * 16, t[4] * 16
    assert abs((xs.min() + xs.max() + 1) / 2 - cx) < 1.5
    assert abs((ys.min() + ys.max() + 1) / 2 - cy) < 1.5
    assert abs((xs.max() - xs.min() + 1) - w) < 2.0
    assert abs((ys.max() - ys.min() + 1) - h) < 2.0


def test_seg_cli_e2e_loss_decreases_and_mask_map(tmp_path):
    """Config-driven yolov5-seg run (segment/train.py + segment/val.py
    surface): loss decreases, eval reports box AND mask mAP."""
    img_dir, lbl_dir = _synthetic_seg_dataset(str(tmp_path))
    cfg = Config({
        "model": dict(masks=4, protos=32, **TINY),
        "data": {"train": {"img_dir": img_dir, "label_dir": lbl_dir},
                 "val": {"img_dir": img_dir, "label_dir": lbl_dir},
                 "batch_size": 3, "max_targets": 4, "mask_ratio": 4},
        "aug": {"mosaic": 0.0, "scale": 0.0, "translate": 0.0,
                "fliplr": 0.5, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0},
        "optimizer": {"lr0": 0.02, "warmup_epochs": 0.0, "cos_lr": True},
        "autoanchor": False,
        "eval_interval": 4,
    })
    work = str(tmp_path / "work")
    os.makedirs(work)
    state, history = train_from_config(cfg, work, num_epochs=8)
    # the detect-head bias priors start objectness near its floor, so
    # early epochs are noise-dominated; assert the back half of the run
    # sits below the front half rather than a strict last<first
    losses = [h["loss"] for h in history]
    assert np.mean(losses[4:]) < np.mean(losses[:4]), losses
    for key in ("map50", "map", "mask_map50", "mask_map"):
        assert 0.0 <= history[-1][key] <= 1.0
    assert os.path.isdir(os.path.join(work, "epoch_7"))


@pytest.mark.full    # full lane: step-level; the cls CLI e2e drives the same step default
def test_cls_train_step_decreases_loss():
    """yolov5-cls: YoloClassifier + label-smoothed CE step learns a
    trivial brightness rule (classify/train.py surface)."""
    from cross_modal_video_engine_tpu.models.yolo import YoloClassifier
    from cross_modal_video_engine_tpu.train.yolo_trainer import (
        make_yolo_cls_train_step)
    model = YoloClassifier(YoloConfig(**TINY))
    state = init_yolo_train_state(model, jax.random.key(0), 64, 4)
    opt = YoloOptHyp(lr0=0.001, warmup_epochs=0.0)
    step = make_yolo_cls_train_step(model, opt, scaled_weight_decay(opt, 4))
    rng = np.random.RandomState(0)
    images = rng.rand(4, 64, 64, 3).astype(np.float32)
    images[:2] *= 0.2                       # dark = class 0
    labels = jnp.asarray([0, 0, 1, 1])
    images = jnp.asarray(images)

    losses = []
    for _ in range(15):
        state, logs = step(state, images, labels, 0.01, 0.01, 0.9)
        losses.append(float(logs["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    assert float(logs["acc"]) >= 0.5


def test_cls_cli_e2e_learns_brightness(tmp_path):
    """Config-driven yolov5-cls run (classify/train.py surface):
    ImageFolder layout, RandomResizedCrop/CenterCrop transforms,
    linear lr schedule, top-1 save-best."""
    from cross_modal_video_engine_tpu.cli.yolo_cls_train import (
        ImageFolderDataset, train_from_config as cls_train)
    rng = np.random.RandomState(0)
    for split, n in (("train", 8), ("val", 4)):
        for ci, name in enumerate(("dark", "light")):
            d = tmp_path / split / name
            d.mkdir(parents=True)
            for i in range(n):
                base = 40 if ci == 0 else 200
                img = rng.randint(base - 30, base + 30,
                                  (48, 48, 3)).astype(np.uint8)
                np.save(str(d / f"im{i}.npy"), img)
    cfg = Config({
        "model": dict(num_classes=2, depth_multiple=0.33,
                      width_multiple=0.125, img_size=32),
        "data": {"train_dir": str(tmp_path / "train"),
                 "val_dir": str(tmp_path / "val"), "batch_size": 4},
        "optimizer": {"lr0": 0.003},
        "eval_interval": 4,
    })
    ds = ImageFolderDataset(str(tmp_path / "train"))
    assert ds.classes == ["dark", "light"] and len(ds) == 16
    work = str(tmp_path / "work")
    os.makedirs(work)
    state, history = cls_train(cfg, work, num_epochs=4)
    assert history[-1]["loss"] < history[0]["loss"]
    assert history[-1]["top1"] == 1.0     # trivial brightness rule
    assert 0.0 <= history[-1]["top5"] <= 1.0
    assert os.path.isdir(os.path.join(work, "best"))
    # resume restores and continues
    state2, h2 = cls_train(cfg, work,
                           resume=os.path.join(work, "epoch_3"),
                           num_epochs=5)
    assert h2[0]["epoch"] == 4 and np.isfinite(h2[0]["loss"])
