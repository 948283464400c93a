"""Gradient + activation extraction (torch-hook replacement).

The reference registers forward/backward hooks on named layers and
backprops the max-class score (MCT/mmaction/utils/get_grads.py:16-146).
On TPU, hooks become pure functions:

  * activations: `capture_layers` on the TimeSformer forward;
  * gradients:   jax.grad of the class score THROUGH `forward_from(tokens,
    layer)` evaluated at the captured tokens — mathematically identical to
    the backward-hook gradient at that layer, but compiled as one XLA
    program (forward + N partial backwards fuse, no graph retention).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def add_capture_methods(recognizer_cls):
    """(kept for API discoverability; Recognizer3D* already expose
    forward_with_capture / score_from_layer)."""
    return recognizer_cls


def grad_extract(model, variables, videos, layers: Sequence[int],
                 target_class: Optional[int] = None,
                 jit: bool = True) -> Dict:
    """Reference Grad.__call__ equivalent (get_grads.py:83-146).

    model: Recognizer3D (or compatible: exposes forward_with_capture and
    score_from_layer).  Returns dict with 'pred' (B,) argmax class,
    'scores' (B, C), and per-layer 'activations'/'gradients'
    {layer: (B, L, D)}."""
    layers = tuple(layers)
    f = (_compiled_extract(model, layers, target_class) if jit
         else _make_extract(model, layers, target_class))
    scores, cls_idx, captured, grads = f(variables, videos)
    return {
        "scores": np.asarray(scores),
        "pred": np.asarray(cls_idx),
        "activations": {l: np.asarray(v) for l, v in captured.items()},
        "gradients": {l: np.asarray(v) for l, v in grads.items()},
    }


def _make_extract(model, layers: Tuple[int, ...],
                  target_class: Optional[int]):
    def run(variables, videos):
        scores, captured = model.apply(
            variables, videos, layers, method="forward_with_capture")
        if target_class is None:
            cls_idx = jnp.argmax(scores, axis=-1)
        else:
            cls_idx = jnp.full((scores.shape[0],), target_class, jnp.int32)

        grads = {}
        for l in layers:
            def score_of(tokens, l=l):
                s = model.apply(variables, tokens, l,
                                method="score_from_layer")
                picked = jnp.take_along_axis(s, cls_idx[:, None], axis=1)
                return picked.sum()

            grads[l] = jax.grad(score_of)(captured[l])
        return scores, cls_idx, captured, grads

    return run


@functools.lru_cache(maxsize=16)
def _compiled_extract(model, layers: Tuple[int, ...],
                      target_class: Optional[int]):
    """One compiled forward+grad program per (model, layers, target):
    a per-call jax.jit wrapper would retrace and recompile every
    request on the serving hot path (20s-9min per compile through the
    remote TPU service)."""
    return jax.jit(_make_extract(model, layers, target_class))


def normalized_cls_grad(grad_tokens: np.ndarray) -> np.ndarray:
    """inference_demo.py:309: grad of the CLS token, batch-meaned and
    L2-normalized -> the probe direction for concept scoring."""
    g = grad_tokens[:, 0].mean(axis=0)
    n = np.linalg.norm(g)
    return g / n if n > 0 else g
