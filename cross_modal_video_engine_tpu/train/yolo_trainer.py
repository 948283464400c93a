"""YOLOv5 detector training — optimizer groups, warmup schedule, EMA.

TPU rebuild of the reference training loop's numerics
(MCT/yolov5/train.py):

* 3-param-group SGD (utils/torch_utils.py smart_optimizer :318-345):
  conv/dense kernels take weight decay, BatchNorm scales and all
  biases do not; nesterov momentum.
* weight-decay scaling ``wd *= batch_size * accumulate / 64``
  (train.py:153-155).
* warmup over ``nw = max(3 epochs, 100 iters)`` (train.py:247): bias
  lr falls 0.1 -> lr0·lf(epoch) while other groups rise from 0, and
  momentum rises 0.8 -> 0.937 (train.py:289-297).
* one-cycle cosine or linear epoch schedule
  (utils/general.py one_cycle :681-683, train.py:159-162).
* ModelEMA with ramped decay ``d = 0.9999·(1 - exp(-updates/2000))``
  over params *and* BN statistics (utils/torch_utils.py:404-430).

All device math lives in one jitted train step; the schedule (a few
scalar interpolations) is computed on host per step and passed in as
scalars, so one XLA program serves the whole run.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.yolo import YoloHyp, scale_hyp, yolo_loss, yolo_seg_loss
from ..models.yolo import YoloConfig, YoloV5


class YoloOptHyp(NamedTuple):
    """Optimizer/schedule hyperparameters (hyp.scratch-low.yaml:6-12)."""
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    cos_lr: bool = False
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0


class YoloTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    vel: Any              # SGD momentum buffers
    ema_params: Any
    ema_stats: Any
    updates: jnp.ndarray  # EMA update counter


def _group_of(path: Tuple[str, ...]) -> int:
    """smart_optimizer grouping: 0=decayed kernels, 1=BN scale, 2=bias."""
    leaf = path[-1]
    if leaf == "bias":
        return 2
    if leaf == "scale":
        return 1
    return 0


def _path_tree(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    groups = [
        _group_of(tuple(getattr(k, "key", getattr(k, "idx", "")) for k in path))
        for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, groups)


def lr_momentum_at(ni: int, epoch: int, nb: int, epochs: int,
                   opt: YoloOptHyp) -> Tuple[float, float, float]:
    """(lr_bias, lr_rest, momentum) at integrated batch ``ni``
    (train.py:159-162, 247, 289-297)."""
    if opt.cos_lr:
        lf = ((1 - math.cos(epoch * math.pi / epochs)) / 2) \
            * (opt.lrf - 1.0) + 1.0
    else:
        lf = (1 - epoch / epochs) * (1.0 - opt.lrf) + opt.lrf
    lr = opt.lr0 * lf
    nw = max(round(opt.warmup_epochs * nb), 100)
    if ni <= nw:
        f = ni / max(nw, 1)
        lr_bias = opt.warmup_bias_lr + (lr - opt.warmup_bias_lr) * f
        lr_rest = lr * f
        mom = opt.warmup_momentum + (opt.momentum - opt.warmup_momentum) * f
    else:
        lr_bias = lr_rest = lr
        mom = opt.momentum
    return lr_bias, lr_rest, mom


def scaled_weight_decay(opt: YoloOptHyp, batch_size: int) -> float:
    """train.py:153-155 — wd scales with the effective batch."""
    accumulate = max(round(64 / batch_size), 1)
    return opt.weight_decay * batch_size * accumulate / 64.0


def init_yolo_train_state(model: YoloV5, rng, img_size: int,
                          batch_size: int = 2) -> YoloTrainState:
    x = jnp.zeros((batch_size, img_size, img_size, 3), jnp.float32)
    variables = model.init(rng, x, train=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return YoloTrainState(params=params, batch_stats=stats, vel=zeros,
                          ema_params=params, ema_stats=stats,
                          updates=jnp.zeros((), jnp.int32))


def _sgd_ema_update(state: YoloTrainState, grads, new_stats,
                    opt: YoloOptHyp, weight_decay: float,
                    lr_bias, lr_rest, momentum,
                    bf16: bool) -> YoloTrainState:
    """The shared optimizer numerics of every YOLO step: smart_optimizer
    3-group nesterov SGD (coupled decay on group 0, bias lr on group 2)
    plus the ramped EMA — one copy, used by the detection/seg and
    classification step factories."""
    if bf16:
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads)
    gtree = _path_tree(state.params)

    def upd(p, g, v, grp):
        # torch SGD: coupled decay, then momentum, nesterov update
        g = g + (weight_decay * p if grp == 0 else 0.0)
        v = momentum * v + g
        lr = lr_bias if grp == 2 else lr_rest
        return p - lr * (g + momentum * v), v

    pairs = jax.tree_util.tree_map(upd, state.params, grads,
                                   state.vel, gtree)
    is_pair = lambda t: isinstance(t, tuple)
    new_params = jax.tree_util.tree_map(lambda t: t[0], pairs,
                                        is_leaf=is_pair)
    new_vel = jax.tree_util.tree_map(lambda t: t[1], pairs,
                                     is_leaf=is_pair)
    updates = state.updates + 1
    d = opt.ema_decay * (1.0 - jnp.exp(-updates / opt.ema_tau))
    ema = lambda e, p: d * e + (1.0 - d) * p
    new_ema = jax.tree_util.tree_map(ema, state.ema_params, new_params)
    new_ema_stats = jax.tree_util.tree_map(ema, state.ema_stats, new_stats)
    return YoloTrainState(new_params, new_stats, new_vel,
                          new_ema, new_ema_stats, updates)


def make_yolo_train_step(model: YoloV5, hyp: YoloHyp, opt: YoloOptHyp,
                         weight_decay: float, bf16: bool = False,
                         mask_cap: int = 128):
    """Returns jitted step(state, images, targets, valid,
    lr_bias, lr_rest, momentum) -> (state, metrics).

    images: (B, H, W, 3) float in [0, 1] (train.py:286 divides u8 by
    255 before the forward; callers feeding uint8 should cast first).

    bf16=True runs the backbone fwd+bwd in bfloat16 (params cast at the
    loss boundary, master weights / velocity / EMA stay f32, the loss
    itself computed on f32-cast detector maps) — the same mixed-precision
    recipe as make_cls_train_step_stats(bf16=True), replacing the
    reference's torch.cuda.amp autocast (train.py:352).

    With model.cfg.masks > 0 (the Segment variant, segment/train.py)
    the step gains a gt_masks argument — (B, T, Hm, Wm) per-target
    binary masks at prototype (stride-4) resolution — placed after
    `valid`, and the criterion becomes `yolo_seg_loss` with the given
    `mask_cap`.
    """
    cfg = model.cfg
    seg = cfg.masks > 0
    loss_hyp = scale_hyp(hyp, nl=3, nc=cfg.num_classes, imgsz=cfg.img_size)

    def loss_fn(params, stats, images, targets, valid, gt_masks):
        if bf16:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            images = images.astype(jnp.bfloat16)
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, images, train=True,
            mutable=["batch_stats"])
        if seg:
            raw, proto = out
            raw = [m.astype(jnp.float32) for m in raw]
            total, items = yolo_seg_loss(
                raw, proto.astype(jnp.float32), targets, valid, gt_masks,
                cfg.anchors, hyp=loss_hyp, num_classes=cfg.num_classes,
                nm=cfg.masks, mask_cap=mask_cap)
        else:
            raw = [m.astype(jnp.float32) for m in out]
            total, items = yolo_loss(raw, targets, valid, cfg.anchors,
                                     hyp=loss_hyp,
                                     num_classes=cfg.num_classes)
        return total, (items, mut["batch_stats"])

    @jax.jit
    def step(state: YoloTrainState, images, targets, valid,
             lr_bias, lr_rest, momentum, gt_masks=None):
        (total, (items, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, targets, valid, gt_masks)
        new_state = _sgd_ema_update(state, grads, new_stats, opt,
                                    weight_decay, lr_bias, lr_rest,
                                    momentum, bf16)
        return new_state, {"loss": total, **items}

    return step


def make_yolo_cls_train_step(model, opt: YoloOptHyp, weight_decay: float,
                             label_smoothing: float = 0.1,
                             bf16: bool = False):
    """Classification training step for `YoloClassifier`
    (MCT/yolov5/classify/train.py): label-smoothed cross-entropy
    (smartCrossEntropyLoss :162, eps default 0.1 :289), the
    smart_optimizer param groups + nesterov SGD and ramped EMA — the
    same numerics as the detection step (the reference's default
    optimizer is Adam :286; this implements its SGD choice, consistent
    with the detection trainer).

    Returns jitted step(state, images, labels, lr_bias, lr_rest,
    momentum) -> (state, {'loss', 'acc'}).
    """
    def loss_fn(params, stats, images, labels):
        if bf16:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            images = images.astype(jnp.bfloat16)
        logits, mut = model.apply(
            {"params": params, "batch_stats": stats}, images, train=True,
            mutable=["batch_stats"])
        logits = logits.astype(jnp.float32)
        nc = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, nc)
        smoothed = onehot * (1.0 - label_smoothing) + label_smoothing / nc
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.sum(smoothed * logp, axis=-1))
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, (acc, mut["batch_stats"])

    @jax.jit
    def step(state: YoloTrainState, images, labels,
             lr_bias, lr_rest, momentum):
        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, labels)
        new_state = _sgd_ema_update(state, grads, new_stats, opt,
                                    weight_decay, lr_bias, lr_rest,
                                    momentum, bf16)
        return new_state, {"loss": loss, "acc": acc}

    return step


def letterbox(img: np.ndarray, new: int = 640,
              color: int = 114) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Aspect-preserving resize + pad to (new, new) (the reference
    dataloader's letterbox, utils/augmentations.py).  Returns the
    padded image, the scale ratio and the (dx, dy) pad in pixels."""
    import cv2
    h, w = img.shape[:2]
    r = min(new / h, new / w)
    nh, nw = round(h * r), round(w * r)
    if (nh, nw) != (h, w):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    dy, dx = (new - nh) / 2, (new - nw) / 2
    top, bottom = int(round(dy - 0.1)), int(round(dy + 0.1))
    left, right = int(round(dx - 0.1)), int(round(dx + 0.1))
    out = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=(color,) * 3)
    return out, r, (left, top)


def letterbox_boxes(boxes: np.ndarray, r: float, pad: Tuple[float, float],
                    orig_hw: Tuple[int, int], new: int) -> np.ndarray:
    """Map normalized [cls, cx, cy, w, h] label rows through the
    `letterbox` geometry."""
    if len(boxes) == 0:
        return boxes
    h, w = orig_hw
    out = boxes.copy()
    out[:, 1] = (boxes[:, 1] * w * r + pad[0]) / new
    out[:, 2] = (boxes[:, 2] * h * r + pad[1]) / new
    out[:, 3] = boxes[:, 3] * w * r / new
    out[:, 4] = boxes[:, 4] * h * r / new
    return out
