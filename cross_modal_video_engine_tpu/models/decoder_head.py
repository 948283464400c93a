"""Label-sequence decoder head for caption generation.

TPU rebuild of MCT/mmaction/models/heads/decoder_head.py:49-228
(`RNNDecoderHead`): a GRU decoder over the (pooled) encoder feature that
emits sigmoid multi-label probabilities per step.

* train mode: teacher forcing — step 0 feeds the learned start embedding,
  step i>0 feeds `targets_emb[:, i]` (decoder_head.py:147-185);
* inference mode: greedy feedback — the previous step's probabilities,
  binarized at `threshold`, are fed back (decoder_head.py:187-227);
* both modes share one `lax.scan` over `max_length` steps with the
  branch select inside the carry — no data-dependent python loop, one
  compiled program (the reference's python for-loop re-dispatches
  max_length CUDA kernels per sample batch).

The GRU input is concat(current_words, encoder_feature) as in the
reference `encoder_embedding_mean=True` path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class RNNDecoderConfig:
    num_classes: int = 400          # output dim per step (num_classes incl. pad)
    in_channels: int = 768          # encoder feature dim
    max_len: int = 5
    threshold: float = 0.5
    input_dropout_p: float = 0.1


class GRUCell(nn.Module):
    """Torch-layout GRU cell (gate order r, z, n)."""

    hidden: int

    @nn.compact
    def __call__(self, h, x):
        H = self.hidden
        wi = self.param("wi", nn.initializers.lecun_normal(),
                        (x.shape[-1], 3 * H))
        bi = self.param("bi", nn.initializers.zeros, (3 * H,))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 3 * H))
        bh = self.param("bh", nn.initializers.zeros, (3 * H,))
        gx = jnp.dot(x, wi, preferred_element_type=jnp.float32) + bi
        gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
        xr, xz, xn = jnp.split(gx, 3, -1)
        hr, hz, hn = jnp.split(gh, 3, -1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


class RNNDecoderHead(nn.Module):
    cfg: RNNDecoderConfig

    @nn.compact
    def __call__(self, encoder_outputs: jnp.ndarray,
                 targets_emb: Optional[jnp.ndarray] = None,
                 mode: str = "train", *, train: bool = False) -> jnp.ndarray:
        """encoder_outputs: (B, in_channels) pooled feature.
        targets_emb: (B, max_len, num_classes) teacher-forcing inputs
        (required when mode='train').
        Returns per-step sigmoid probabilities (B, max_len, num_classes)."""
        cfg = self.cfg
        B = encoder_outputs.shape[0]
        C, H = cfg.num_classes, cfg.in_channels
        assert mode in ("train", "inference")
        if mode == "train":
            assert targets_emb is not None
        else:
            targets_emb = jnp.zeros((B, cfg.max_len, C), encoder_outputs.dtype)

        start_emb = self.param("start_emb", nn.initializers.normal(1.0),
                               (1, C))
        # GRU + output params created OUTSIDE the scan (creating flax
        # submodule params inside a lax.scan body leaks tracers)
        in_dim = C + H
        wi = self.param("rnn_wi", nn.initializers.lecun_normal(),
                        (in_dim, 3 * H))
        bi = self.param("rnn_bi", nn.initializers.zeros, (3 * H,))
        wh = self.param("rnn_wh", nn.initializers.orthogonal(), (H, 3 * H))
        bh = self.param("rnn_bh", nn.initializers.zeros, (3 * H,))
        wo = self.param("out_kernel", nn.initializers.truncated_normal(0.02),
                        (H, C))
        bo = self.param("out_bias", nn.initializers.zeros, (C,))

        def cell(h, x):
            gx = jnp.dot(x, wi, preferred_element_type=jnp.float32) + bi
            gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
            xr, xz, xn = jnp.split(gx, 3, -1)
            hr, hz, hn = jnp.split(gh, 3, -1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            return (1.0 - z) * n + z * h

        def out_proj(h):
            return jnp.dot(h, wo, preferred_element_type=jnp.float32) + bo

        h0 = jnp.zeros((B, H), jnp.float32)
        start = jnp.broadcast_to(start_emb, (B, C))
        teacher = jnp.swapaxes(targets_emb, 0, 1)      # (T, B, C)
        steps = jnp.arange(cfg.max_len)

        # dropout rngs must be split outside the scan for determinism
        if train and cfg.input_dropout_p > 0:
            rngs = jax.random.split(self.make_rng("dropout"), cfg.max_len)
        else:
            rngs = jnp.zeros((cfg.max_len, 2), jnp.uint32)

        def step(carry, inp):
            h, prev_probs = carry
            i, tgt, rng = inp
            if mode == "train":
                current = jnp.where(i == 0, start, tgt)
            else:
                fed = (prev_probs > cfg.threshold).astype(prev_probs.dtype)
                current = jnp.where(i == 0, start, fed)
            x = jnp.concatenate([current, encoder_outputs], axis=-1)
            if train and cfg.input_dropout_p > 0:
                keep = 1.0 - cfg.input_dropout_p
                mask = jax.random.bernoulli(rng, keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
            h = cell(h, x)
            probs = jax.nn.sigmoid(out_proj(h))
            return (h, probs), probs

        (_, _), probs_seq = jax.lax.scan(
            step, (h0, jnp.zeros((B, C), jnp.float32)),
            (steps, teacher, rngs))
        return jnp.swapaxes(probs_seq, 0, 1)            # (B, T, C)

    def decode_greedy(self, encoder_outputs: jnp.ndarray) -> jnp.ndarray:
        """Inference helper: thresholded binary label sequence (B, T, C)."""
        probs = self(encoder_outputs, mode="inference")
        return (probs > self.cfg.threshold).astype(jnp.int32)
