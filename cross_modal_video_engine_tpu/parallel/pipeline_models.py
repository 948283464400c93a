"""Pipeline-parallel execution of real model towers.

Consumers for `parallel.pipeline.spmd_pipeline`: the TimeSformer block
tower (homogeneous `block_i` params) shards over a 'stage' mesh axis and
streams microbatches GPipe-style — the scaling path for towers that
outgrow one chip.  The reference has nothing comparable (its models fit
one GPU, SURVEY §2.4); this is TPU-native headroom, wired to the actual
flagship recognizer rather than a toy stage function.

Works on any TimeSformer whose `num_layers` is divisible by the stage
count; each stage applies `num_layers / S` blocks.  Gradients flow —
`spmd_pipeline` is a scan over `ppermute`, both differentiable — so
`pipelined_cls_loss` trains end to end (see tests/test_pipeline_models.py
and the multichip dryrun).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .pipeline import spmd_pipeline, stack_stage_params


def _block_module(backbone):
    """The standalone block module matching the tower's blocks (flax
    modules are reconstructable from (cls, cfg))."""
    from ..models.timesformer import DividedSTBlock, JointBlock
    cfg = backbone.cfg
    cls = (DividedSTBlock if cfg.attention_type == "divided_space_time"
           else JointBlock)
    return cls(cfg, 0.0)


def stack_tower_blocks(backbone_params: Any, num_layers: int,
                       n_stages: int) -> Any:
    """{'block_0': .., 'block_{L-1}': ..} -> stage-major stacked pytree
    with leaves (S, k, ...) where k = L/S blocks run per stage."""
    assert num_layers % n_stages == 0, (num_layers, n_stages)
    k = num_layers // n_stages
    per_stage = []
    for s in range(n_stages):
        per_stage.append(jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[backbone_params[f"block_{s * k + j}"] for j in range(k)]))
    return stack_stage_params(per_stage), k


def pipelined_timesformer_tokens(rec_model, variables, videos: jnp.ndarray,
                                 mesh: Mesh, n_microbatches: int = 4,
                                 axis: str = "stage") -> jnp.ndarray:
    """Forward a Recognizer3D's TimeSformer tower with its blocks
    pipelined over `mesh`'s stage axis.  Returns the pooled cls feature
    (B, D) — numerically identical to the single-chip forward (drop-path
    0, eval mode)."""
    backbone = rec_model.backbone_cfg
    S = mesh.shape[axis]
    L = backbone.num_layers

    tokens = rec_model.apply(
        variables, videos,
        method=lambda m, v: m.backbone.embed_tokens(v))     # (B, T, D)
    bp = variables["params"]["backbone"]
    stage_params, k = stack_tower_blocks(bp, L, S)

    from ..models.timesformer import TimeSformer
    tower = TimeSformer(backbone)
    block = _block_module(tower)

    def stage_fn(params_k, x):
        for j in range(k):
            pj = jax.tree.map(lambda p: p[j], params_k)
            x = block.apply({"params": pj}, x)
        return x

    B = tokens.shape[0]
    M = min(n_microbatches, B)
    assert B % M == 0, (B, M)
    micro = tokens.reshape((M, B // M) + tokens.shape[1:])
    out = spmd_pipeline(stage_fn, stage_params, micro, mesh, axis)
    out = out.reshape((B,) + tokens.shape[1:])

    pooled = rec_model.apply(
        variables, out, method=lambda m, x: m.backbone._pool(x))
    return pooled[1]                                        # cls feature


def pipelined_cls_forward(rec_model, variables, videos: jnp.ndarray,
                          mesh: Mesh, n_microbatches: int = 4,
                          axis: str = "stage") -> jnp.ndarray:
    """Pipelined tower + the classifier head -> class scores (B, C)."""
    feat = pipelined_timesformer_tokens(rec_model, variables, videos,
                                        mesh, n_microbatches, axis)
    return rec_model.apply(variables, feat,
                           method=lambda m, f: m.cls_head(f))


def pipelined_cls_loss(rec_model, variables, videos, labels, mesh,
                       n_microbatches: int = 4, axis: str = "stage"):
    """Differentiable CE loss through the pipelined tower (gradients ride
    the same scan/ppermute program backwards).

    NOTE: the tower runs with drop-path/dropout OFF (eval-mode blocks —
    see pipelined_timesformer_tokens), so this is NOT regularization-
    equivalent to the single-chip train step; it validates that the
    pipeline differentiates end-to-end.  Stochastic-depth inside the
    per-stage scan (per-block rngs threaded through ppermute) is the
    production follow-up if pipeline training needs parity."""
    import optax
    scores = pipelined_cls_forward(rec_model, variables, videos, mesh,
                                   n_microbatches, axis)
    return optax.softmax_cross_entropy_with_integer_labels(
        scores, labels).mean()
