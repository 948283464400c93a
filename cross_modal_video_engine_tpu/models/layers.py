"""Shared Flax building blocks for the retrieval models.

TPU-first re-designs of the reference's torch layers:

* `BiGRU` — bidirectional GRU with the torch gate order (r, z, n) so torch
  checkpoints convert 1:1.  The input projection for ALL timesteps is one
  big MXU matmul hoisted out of the recurrence; the `lax.scan` carries only
  the (B, H) hidden state (the reference iterates cuDNN GRU,
  LINAS-engine/model.py:134, 332).
  `packed=True` reproduces torch pack_padded_sequence semantics (used on
  the text side, model.py:329-336): invalid steps carry the hidden state
  through and outputs beyond the length are zeroed.  `packed=False`
  reproduces the video side, which runs the raw padded batch
  (model.py:151).
* `ConvBank1D` — the multi-window Conv2d(1, K, (w, D), padding=(w-1, 0))
  bank + ReLU + max-over-time (model.py:137-141, 166-171), expressed as
  1-d convolutions with in-channels D (identical math, MXU-tileable).
* `MFC` — FC stack with optional residual blocks, BatchNorm and dropout
  (model.py:51-116).
* `LatentMapping` — MFC + L2 norm into the common space (model.py:362-381).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.similarity import l2norm


class KernelParams(nn.Module):
    """nn.Conv/nn.Dense's kernel param (lecun_normal, no bias) without a
    forward pass — lets an exact-math rewrite (e.g. the s2d stems in
    ops/s2d_stem.py) own the SAME <name>/kernel leaf the plain module
    path trains, so importers and checkpoints are untouched."""

    shape: Tuple[int, ...]

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.shape)


class BiGRU(nn.Module):
    hidden_size: int
    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (B, T, D) float; mask: (B, T) 1/0. Returns (B, T, 2H)."""
        B, T, D = x.shape
        H = self.hidden_size
        if mask is None:
            mask = jnp.ones((B, T), x.dtype)

        def direction(name: str, reverse: bool) -> jnp.ndarray:
            # torch layout: weight_ih_l0 (3H, D) gate order [r|z|n]
            wi = self.param(f"{name}_wi", nn.initializers.lecun_normal(), (D, 3 * H))
            bi = self.param(f"{name}_bi", nn.initializers.zeros, (3 * H,))
            wh = self.param(f"{name}_wh", nn.initializers.orthogonal(), (H, 3 * H))
            bh = self.param(f"{name}_bh", nn.initializers.zeros, (3 * H,))

            xp = jnp.dot(x, wi, preferred_element_type=jnp.float32) + bi  # (B,T,3H)
            xs = jnp.swapaxes(xp, 0, 1)          # (T,B,3H)
            ms = jnp.swapaxes(mask, 0, 1)[..., None]  # (T,B,1)
            if reverse:
                xs, ms = xs[::-1], ms[::-1]

            def step(h, inp):
                xt, mt = inp
                gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
                xr, xz, xn = jnp.split(xt, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h
                if self.packed:
                    h_new = jnp.where(mt > 0, h_new, h)
                return h_new, h_new

            # the step computes in f32 (preferred_element_type), so the
            # carry must be f32 too — an x.dtype carry crashes the scan
            # with a dtype mismatch for bf16 inputs
            h0 = jnp.zeros((B, H), jnp.float32)
            _, outs = jax.lax.scan(step, h0, (xs, ms))
            if self.packed:
                outs = outs * ms                  # zeros beyond length, like pad_packed
            if reverse:
                outs = outs[::-1]
            return jnp.swapaxes(outs, 0, 1)       # (B,T,H)

        fwd = direction("fwd", reverse=False)
        bwd = direction("bwd", reverse=True)
        return jnp.concatenate([fwd, bwd], axis=-1)


class ConvBank1D(nn.Module):
    """Multi-window temporal conv bank + ReLU + max-over-time."""

    kernel_num: int
    kernel_sizes: Sequence[int] = (2, 3, 4, 5)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, C). Returns (B, kernel_num * len(kernel_sizes))."""
        outs = []
        for w in self.kernel_sizes:
            y = nn.Conv(
                features=self.kernel_num,
                kernel_size=(w,),
                padding=[(w - 1, w - 1)],        # torch padding=(w-1, 0) on H axis
                name=f"conv_w{w}",
            )(x)                                  # (B, T+w-1, K)
            y = nn.relu(y)
            outs.append(jnp.max(y, axis=1))       # max over time
        return jnp.concatenate(outs, axis=-1)


class MFC(nn.Module):
    """FC stack: fc1 -> [ +relu(fc_i) residuals ] -> BN -> dropout."""

    out_features: Sequence[int]  # sizes after the input layer, e.g. (1536,)
    dropout_rate: float = 0.2
    have_bn: bool = True
    have_last_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if len(self.out_features) == 0:
            return x
        features = nn.Dense(self.out_features[0], name="fc1")(x)
        for i, f in enumerate(self.out_features[1:], start=2):
            features = features + nn.relu(nn.Dense(f, name=f"fc{i}")(features))
        if self.have_bn and self.have_last_bn:
            features = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="bn_1",
            )(features)
        features = nn.Dropout(self.dropout_rate, deterministic=not train)(features)
        return features


class LatentMapping(nn.Module):
    """MFC + L2 normalization into the 1536-d common space."""

    out_features: Sequence[int]
    dropout_rate: float = 0.2
    l2norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        y = MFC(self.out_features, self.dropout_rate, name="mapping")(x, train=train)
        return l2norm(y) if self.l2norm else y
