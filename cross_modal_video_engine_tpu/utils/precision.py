"""Inference-precision helpers.

``cast_inference_variables`` is the torch ``.half()`` analogue for
checkpoint trees loaded for INFERENCE: every floating leaf (params and
batch_stats alike) is cast to the model's compute dtype.  Modules that
thread a ``dtype`` through every Dense/Conv (models/clip.py) don't need
it — flax casts per-op — but families that rely on input dtype
(TimeSformer's FFN, the conv backbones' BN) get silently promoted back
to f32 by ``Dense(dtype=None)``/``BatchNorm`` whenever the loaded params
are f32, so a "bfloat16" config would run an f32 program (same bug class
as the r4 bench-builder fix; training was always covered by the
trainers' in-step master-param cast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_inference_variables(variables, dtype=jnp.bfloat16):
    """Cast every floating leaf of a checkpoint tree to `dtype`.
    Integer leaves (e.g. step counters, vocab ids) pass through."""
    if dtype == jnp.float32:
        return variables
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, variables)


def maybe_cast_bf16(variables, cfg_d):
    """The one checkpoint-load hook every inference loader should call:
    casts the tree to bf16 iff the backbone config says dtype='bfloat16'.
    Centralised so a new loader can't forget the conditional (the
    duplicated 4-line block missed cli/explain_demo.py in its first
    round)."""
    if cfg_d.get("backbone", {}).get("dtype") == "bfloat16":
        return cast_inference_variables(variables)
    return variables
