"""Expert parallelism: switch-routed MoE MLP over an 'expert' mesh axis.

The reference has no MoE (its towers fit one GPU); this is the
expert-parallel scaling path that completes the framework's parallelism
set (dp/tp/sp/pp/ep).  Top-1 "switch" routing with a capacity limit:

  * every device holds ITS expert's MLP weights (sharded over `axis`)
    and a shard of the tokens;
  * tokens are packed into per-expert capacity slots and exchanged with
    ONE `all_to_all` over ICI, the expert MLP runs as a dense local
    GEMM, and a second all_to_all returns results;
  * the returned value is the PRE-residual layer output: over-capacity
    tokens yield 0, so the consumer's `x + out` residual reduces to
    identity for them (standard switch-transformer semantics; returning
    the input here would double-inject it through the residual add);
    the router is trained with the usual load-balance auxiliary loss.

Everything is one shard_map program; routing is argmax + one-hot
matmuls, so there is no data-dependent shape anywhere.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def expert_parallel_mlp(tokens: jnp.ndarray, router_w: jnp.ndarray,
                        w1: jnp.ndarray, w2: jnp.ndarray, mesh: Mesh,
                        axis: str = "expert",
                        capacity_factor: float = 1.25
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """tokens: (N, D) sharded over `axis` (N divisible by the axis size);
    router_w: (D, E) replicated; w1: (E, D, H), w2: (E, H, D) sharded over
    `axis` on the expert dim.  Returns (outputs (N, D) sharded like
    tokens, aux dict with 'load_balance_loss' and 'dropped_fraction').
    """
    E = mesh.shape[axis]
    n_local = tokens.shape[0] // E
    C = max(1, int(n_local * capacity_factor / E + 0.999))   # slots/expert

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(), P()),
        check_vma=False)
    def run(x, rw, w1_l, w2_l):
        n, D = x.shape
        logits = x @ rw                                  # (n, E)
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)              # (n,)
        gate = jnp.max(probs, axis=-1)
        # slot bookkeeping stays f32 regardless of token dtype: a bf16
        # cumsum rounds positions past 256, colliding distinct tokens
        # into one dispatch slot (their features silently sum)
        onehot_f = jax.nn.one_hot(expert, E, dtype=jnp.float32)
        onehot = onehot_f.astype(x.dtype)

        # switch load-balance loss: E * sum(frac_tokens * frac_probs)
        frac_tokens = onehot_f.mean(axis=0)
        frac_probs = probs.astype(jnp.float32).mean(axis=0)
        lb = E * jnp.sum(frac_tokens * frac_probs)
        lb = jax.lax.pmean(lb, axis)

        # capacity slots: position of each token within its expert queue
        pos = (jnp.cumsum(onehot_f, axis=0) - 1.0) * onehot_f
        pos = pos.sum(axis=-1).astype(jnp.int32)         # (n,)
        keep = (pos < C).astype(x.dtype)
        dropped = jax.lax.pmean(1.0 - keep.mean(), axis)

        # pack: (E, C, D) dispatch buffer via one-hot matmuls
        slot = jax.nn.one_hot(pos, C, dtype=x.dtype) * keep[:, None]
        disp = jnp.einsum("ne,nc,nd->ecd", onehot, slot, x)

        # exchange: block e goes to device e; received blocks stack by
        # source device -> (E_src, C, D) tokens for THIS device's expert
        recv = jax.lax.all_to_all(disp, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        h = jax.nn.relu(
            jnp.einsum("scd,dh->sch", recv, w1_l[0],
                       preferred_element_type=jnp.float32).astype(x.dtype))
        y = jnp.einsum("sch,hd->scd", h, w2_l[0],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        back = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0,
                                  tiled=False)           # (E, C, D)

        # unpack: token i reads its (expert, slot) cell; dropped tokens
        # contribute 0 so the consumer's residual passes them through
        got = jnp.einsum("ne,nc,ecd->nd", onehot, slot, back)
        out = jnp.where((keep * gate)[:, None] > 0,
                        got * gate[:, None], 0.0)
        return out, lb, dropped

    out, lb, dropped = run(tokens, router_w, w1, w2)
    return out, {"load_balance_loss": lb, "dropped_fraction": dropped}
