"""Ring attention: sequence-parallel attention over the mesh.

For clips/token streams too long for one chip's HBM, K/V shards rotate
around the mesh 'data' ring via `jax.lax.ppermute` while every chip
accumulates its queries' online softmax — communication overlaps compute
and total traffic equals one all-gather but never materializes the full
K/V on any chip (guide: boom_attention_tricks.md §15-16).

The reference has no sequence parallelism (SURVEY §5 — sequences are
tiny); this is the scale-out path for long-video variants of the
TimeSformer towers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring_attention_local(q, k_local, v_local, sm_scale: float,
                          axis_name: str):
    """q: (B, H, Sq_local, D); k/v: (B, H, Skv_local, D) — one shard each.
    Rotates K/V around `axis_name`, returns attention over the FULL kv."""
    n = jax.lax.axis_size(axis_name)

    def step(carry, _):
        m, l, o, k_blk, v_blk = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk,
                       preferred_element_type=jnp.float32) * sm_scale
        m_curr = s.max(axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + p.sum(axis=-1, keepdims=True)
        o_next = alpha * o + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_next, l_next, o_next, k_blk, v_blk), None

    B, H, Sq, D = q.shape
    init = (
        jnp.full((B, H, Sq, 1), -jnp.inf, jnp.float32),
        jnp.zeros((B, H, Sq, 1), jnp.float32),
        jnp.zeros((B, H, Sq, D), jnp.float32),
        k_local, v_local,
    )
    (m, l, o, _, _), _ = jax.lax.scan(step, init, None, length=n)
    return (o / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, sm_scale: Optional[float] = None,
                   axis_name: str = "data"):
    """q, k, v: (B, H, S, D) host/global arrays; S is sharded over
    `axis_name` inside.  Returns (B, H, S, D)."""
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    f = shard_map(
        functools.partial(_ring_attention_local, sm_scale=sm_scale,
                          axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None),
                  P(None, None, axis_name, None),
                  P(None, None, axis_name, None)),
        out_specs=P(None, None, axis_name, None),
        check_vma=False,
    )
    return f(q, k, v)
