"""Mini-batch blending: mixup / cutmix (MCT/mmaction/datasets/blending_utils.py).

TPU-native rewrite: pure jittable functions over NTHWC clips.  The reference
samples torch Beta/randperm on host per batch; here everything derives from a
jax PRNG key inside the compiled train step, so blending adds zero host work
and no recompilation.  Cutmix keeps shapes static by masking with iota
comparisons instead of dynamic slicing, and corrects lambda with the *actual*
clipped box area exactly like the reference (blending_utils.py:91-140).

Labels go in as integer hard labels and come out as (B, num_classes) soft
distributions, matching BaseMiniBatchBlending.__call__ (:13-58).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..utils.registry import Registry

BLENDINGS = Registry("blendings")


def _one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


@BLENDINGS.register("MixupBlending")
def mixup(rng: jax.Array, imgs: jnp.ndarray, one_hot: jnp.ndarray,
          alpha: float = 0.2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lam·x + (1−lam)·x[perm] on clips and labels (blending_utils.py:60-88)."""
    k_lam, k_perm = jax.random.split(rng)
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, imgs.shape[0])
    lam_i = lam.astype(imgs.dtype)
    mixed = lam_i * imgs + (1 - lam_i) * imgs[perm]
    soft = lam * one_hot + (1 - lam) * one_hot[perm]
    return mixed, soft


@BLENDINGS.register("CutmixBlending")
def cutmix(rng: jax.Array, imgs: jnp.ndarray, one_hot: jnp.ndarray,
           alpha: float = 0.2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paste a random box from x[perm]; lam = 1 − box_area/img_area
    (blending_utils.py:91-140).  imgs layout (..., H, W, C)."""
    k_lam, k_perm, k_cx, k_cy = jax.random.split(rng, 4)
    h, w = imgs.shape[-3], imgs.shape[-2]
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, imgs.shape[0])

    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (w * cut_rat).astype(jnp.int32)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cx = jax.random.randint(k_cx, (), 0, w)
    cy = jax.random.randint(k_cy, (), 0, h)
    bbx1 = jnp.clip(cx - cut_w // 2, 0, w)
    bby1 = jnp.clip(cy - cut_h // 2, 0, h)
    bbx2 = jnp.clip(cx + cut_w // 2, 0, w)
    bby2 = jnp.clip(cy + cut_h // 2, 0, h)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    box = ((ys >= bby1) & (ys < bby2) & (xs >= bbx1) & (xs < bbx2))
    mask = box[..., None].astype(imgs.dtype)          # (H, W, 1)
    mixed = imgs * (1 - mask) + imgs[perm] * mask
    lam_adj = 1.0 - ((bbx2 - bbx1) * (bby2 - bby1)) / float(h * w)
    soft = lam_adj * one_hot + (1 - lam_adj) * one_hot[perm]
    return mixed, soft


def make_blending(name: str, num_classes: int, alpha: float = 0.2
                  ) -> Callable[[jax.Array, jnp.ndarray, jnp.ndarray],
                                Tuple[jnp.ndarray, jnp.ndarray]]:
    """Config-key constructor: (rng, imgs, int_labels) -> (imgs, soft_labels),
    the `train_cfg=dict(blending=dict(type=...))` contract."""
    fn = BLENDINGS.get(name)

    def blend(rng, imgs, labels):
        return fn(rng, imgs, _one_hot(labels, num_classes), alpha)

    return blend
