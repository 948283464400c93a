"""Parameter/activation sharding rules for pjit training.

Replaces the reference's NCCL DDP (MCT distribution_env.py build_ddp):
instead of replicating the model and all-reducing gradients, parameters are
laid out over the mesh with GSPMD:

  * data parallel: batch leading axis -> 'data'; gradient reduction is the
    psum XLA inserts automatically.
  * tensor parallel: wide Dense kernels shard their output (or input)
    columns over 'model'; XLA inserts the all-gather/reduce-scatter pairs
    on ICI.  At reference model scale (<= ViT-L) 'model' is typically 1,
    but the wiring lets bigger towers shard without code changes.

`partition_params` walks a params pytree and assigns PartitionSpecs by
shape heuristics (matching the Megatron column/row split for back-to-back
projections: qkv/c_fc column-split, out_proj/c_proj row-split).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_SPLIT_SUFFIXES = ("q_proj", "k_proj", "v_proj", "c_fc", "ffn_fc1")
ROW_SPLIT_SUFFIXES = ("out_proj", "c_proj", "ffn_fc2")


def _rule(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim < 2:
        return P()
    for s in COLUMN_SPLIT_SUFFIXES:
        if f"/{s}/" in f"/{joined}/":
            return P(None, "model")      # split output features
    for s in ROW_SPLIT_SUFFIXES:
        if f"/{s}/" in f"/{joined}/":
            return P("model", None)      # split input features
    return P()


def partition_params(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for a params tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        specs[jax.tree_util.keystr(path)] = _rule(path, leaf)

    def to_sharding(path, leaf):
        return NamedSharding(mesh, specs[jax.tree_util.keystr(path)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a host params tree onto the mesh according to the rules."""
    shardings = partition_params(params, mesh)
    return jax.device_put(params, shardings)


def batch_spec(mesh: Mesh):
    """Leading-axis batch sharding; on a multi-slice (dcn, data, model)
    mesh the batch shards jointly over ('dcn', 'data') so each slice
    row holds a contiguous sub-batch and the gradient all-reduce is
    hierarchical (ICI within a slice, one DCN hop across)."""
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def opt_state_shardings(opt_state: Any, params: Any, mesh: Mesh) -> Any:
    """Shardings for an optax state tree.

    Param-shaped subtrees (adam mu/nu, sgd trace, ...) follow the same
    partition rules as the params they mirror; everything else (step
    counts, empty states) replicates.  The result matches `opt_state`'s
    pytree structure exactly, so it can be passed to jit
    in_shardings/out_shardings or jax.device_put.
    """
    param_shardings = partition_params(params, mesh)
    params_def = jax.tree.structure(params)
    repl = NamedSharding(mesh, P())

    def is_params_like(x):
        if x is None:
            return False
        try:
            return jax.tree.structure(x) == params_def
        except Exception:
            return False

    return jax.tree.map(
        lambda x: param_shardings if is_params_like(x) else repl,
        opt_state, is_leaf=is_params_like)
