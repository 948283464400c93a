"""Activation interventions: zero-out and temporal-shuffle probes.

Rebuilds of the MCT interpretability probes:

* `zero_out_tokens` — the core/hooks/zeroout.py equivalent: re-run the
  model from a captured layer with selected tokens zeroed and measure the
  prediction change (functional, no hooks);
* `temporal_shuffle_contrast` — the RandomShuffleFrames +
  recognizer_shuffle.py probe: embedding/score distance between the
  original clip and temporally shuffled versions, quantifying how much
  the model uses temporal order (tools/ctvs/ctv_analysis/
  temporal_analysis/temporal_shuffle_contrast.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def zero_out_tokens(model, variables, videos: jnp.ndarray, layer: int,
                    token_indices: Sequence[int]) -> Dict:
    """Zero the given token positions at `layer` and report the score
    deltas.  Returns dict(scores, scores_zeroed, delta, pred, pred_zeroed).
    """
    scores, captured = model.apply(variables, videos, (layer,),
                                   method="forward_with_capture")
    tokens = captured[layer]
    idx = np.asarray(list(token_indices), dtype=np.int32)
    if idx.size:
        zeroed = tokens.at[:, jnp.asarray(idx)].set(0.0)
    else:
        zeroed = tokens
    scores_z = model.apply(variables, zeroed, layer,
                           method="score_from_layer")
    return {
        "scores": np.asarray(scores),
        "scores_zeroed": np.asarray(scores_z),
        "delta": np.asarray(scores - scores_z),
        "pred": np.asarray(jnp.argmax(scores, -1)),
        "pred_zeroed": np.asarray(jnp.argmax(scores_z, -1)),
    }


def temporal_shuffle_contrast(embed_fn, frames: np.ndarray,
                              n_shuffles: int = 8, seed: int = 0) -> Dict:
    """embed_fn: (N, T, H, W, 3) -> (N, D).  Embeds the original clip and
    `n_shuffles` random temporal permutations in ONE batch; reports cosine
    similarity stats (low similarity = temporally sensitive model)."""
    rng = np.random.default_rng(seed)
    T = frames.shape[0]
    perms = [rng.permutation(T) for _ in range(n_shuffles)]
    stack = np.stack([frames] + [frames[p] for p in perms])
    embs = np.asarray(embed_fn(stack))
    ref = embs[0] / max(np.linalg.norm(embs[0]), 1e-12)
    sims = []
    for e in embs[1:]:
        sims.append(float(ref @ (e / max(np.linalg.norm(e), 1e-12))))
    sims = np.asarray(sims)
    return {
        "similarities": sims,
        "mean_similarity": float(sims.mean()),
        "temporal_sensitivity": float(1.0 - sims.mean()),
        "perms": perms,
    }
