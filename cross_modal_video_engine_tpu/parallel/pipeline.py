"""SPMD pipeline parallelism (GPipe-style microbatching over a mesh axis).

The reference has no pipeline parallelism (SURVEY §2.4) — its models fit
one GPU.  This is the TPU-native scaling path for towers that outgrow a
chip: layers shard over a 'stage' mesh axis, microbatches stream through
with `ppermute` hops between neighboring stages (ICI), and every stage
computes every tick after the fill phase — utilization M/(M+S-1) for M
microbatches over S stages.

All control flow is a single `lax.scan` inside one `shard_map`, so the
whole pipeline (and its gradient — scan/ppermute are differentiable)
compiles to ONE XLA program.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(params_list):
    """[per-stage pytree, ...] -> one pytree with a leading stage axis
    (the layout spmd_pipeline shards over the 'stage' mesh axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def spmd_pipeline(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                  stage_params: Any, microbatches: jnp.ndarray,
                  mesh: Mesh, axis: str = "stage") -> jnp.ndarray:
    """Run `microbatches` through S pipeline stages.

    stage_fn(params_i, x) -> y applies ONE stage (same output/input
    shape so activations can flow stage-to-stage).
    stage_params: pytree whose leaves have leading axis S (stage-major;
    see `stack_stage_params`) — sharded so each device holds its stage.
    microbatches: (M, mb, ...) — replicated here (dryrun/demo scale; a
    production loader feeds stage 0's hosts only).
    Returns (M, mb, ...) outputs, replicated.
    """
    S = mesh.shape[axis]
    M = microbatches.shape[0]
    T = M + S - 1                      # fill + steady + drain ticks
    perm = [(i, (i + 1) % S) for i in range(S)]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_vma=False)
    def run(params, inputs):
        # each device must hold exactly ONE stage slice: with more
        # stages than mesh devices the local leading axis is >1 and
        # p[0] would silently drop the extra stages (use
        # pipeline_models.stack_tower_blocks' (S, k) layout for
        # multiple blocks per stage)
        lead = {jax.tree.leaves(params)[0].shape[0]} if jax.tree.leaves(
            params) else {1}
        assert lead == {1}, (
            f"stage_params leading axis shards to {lead} per device; "
            f"expected 1 (S must equal the '{axis}' mesh axis size)")
        params = jax.tree.map(lambda p: p[0], params)   # this stage's slice
        stage = jax.lax.axis_index(axis)
        buf0 = jnp.zeros_like(inputs[0])
        out0 = jnp.zeros_like(inputs)

        def tick(carry, t):
            buf, out = carry
            # stage 0 ingests microbatch t during the fill/steady phase
            inp = inputs[jnp.clip(t, 0, M - 1)]
            x = jnp.where(stage == 0, inp, buf)
            y = stage_fn(params, x)
            # the last stage emits microbatch t-(S-1) once the pipe fills
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            emit = (stage == S - 1) & (t >= S - 1)
            row = jnp.where(emit, y, out[out_idx])
            out = jax.lax.dynamic_update_index_in_dim(out, row, out_idx, 0)
            # rotate activations one stage forward over ICI
            buf = jax.lax.ppermute(y, axis, perm)
            return (buf, out), None

        (_, out), _ = jax.lax.scan(tick, (buf0, out0), jnp.arange(T))
        # outputs live on the last stage; replicate them
        return jax.lax.psum(
            jnp.where(stage == S - 1, out, jnp.zeros_like(out)), axis)

    return run(stage_params, microbatches)
