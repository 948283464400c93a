"""Pallas flash attention (TPU).

Fused softmax(Q K^T) V that never materializes the (S, S) scores matrix:
the KV sequence is tiled and an online softmax (running max m, running sum
l, corrected accumulator) runs in VMEM scratch, following the canonical
JAX Pallas TPU flash kernel structure (see /opt/skills/guides/
boom_attention_tricks.md sections 2-6).

* forward: Pallas kernel, grid (batch*heads, Sq/block_q, Skv/block_k),
  fp32 softmax statistics, causal tile-skip + element mask;
* backward: custom_vjp recomputes attention with XLA einsums (cheap at
  the tower sizes this framework trains; the kernel is the inference/
  serving hot path).

Inputs are (B, H, S, D) with D <= 128 padded to the lane width by the
wrapper; sequences are padded to block multiples and masked.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
LANES = 128


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                sm_scale: float, causal: bool, block_q: int, block_k: int,
                kv_valid: int):
    # (q-row padding needs no mask here: padded output rows are sliced
    # off by the caller; kv padding is masked via kv_valid)
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        should_run = ((q_idx + 1) * block_q - 1) >= (kv_idx * block_k)
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0]                                   # (bq, d)
        k = k_ref[0]                                   # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # (bq, bk)

        row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
               + q_idx * block_q)
        col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
               + kv_idx * block_k)
        mask = col < kv_valid                          # padding mask
        if causal:
            mask = jnp.logical_and(mask, col <= row)
        s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]                            # (bq, LANES)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)     # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)           # broadcast to LANES
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        acc_scr[...] = acc_scr[...] * alpha[:, :1]
        v = v_ref[0]
        acc_scr[...] += jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _reference_attention(q, k, v, sm_scale, causal, kv_valid):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    Skv = k.shape[1]
    col = jnp.arange(Skv)[None, None, :]
    mask = col < kv_valid
    if causal:
        row = jnp.arange(q.shape[1])[None, :, None]
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


def _pad_to(x, size, axis):
    pad = (-x.shape[axis]) % size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, sm_scale: float = 1.0, causal: bool = False,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None):
    """q, k, v: (B, H, S, D) -> (B, H, Sq, D).  D and S are padded
    internally to TPU tiles; padding keys are masked out.

    Block sizes default adaptively (swept on v5e, bf16, D=128, r2):
    1024/1024 from S>=2048 — 94.4 TFLOP/s at S=8192 (48% peak; XLA OOMs
    there) and 50.5 at S=4096 (XLA: 14.5) — and 256/512 below, where
    sweeps showed big blocks losing.  Below ~S=1024 prefer plain XLA
    attention outright (lane padding of small head dims costs more than
    tiling saves; ops crossover in the model wrappers)."""
    return _flash_attention_impl(q, k, v, sm_scale, causal, block_q, block_k)


def _resolve_blocks(Sq, Skv, block_q, block_k):
    if block_q is None:
        block_q = 1024 if Sq >= 2048 else 256
    if block_k is None:
        block_k = 1024 if Skv >= 2048 else 512
    return block_q, block_k


def _flash_attention_impl(q, k, v, sm_scale, causal, block_q, block_k):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    block_q, block_k = _resolve_blocks(Sq, Skv, block_q, block_k)
    # clamp blocks to (padded) sequence lengths, keep >=128 for tiling
    block_q = max(LANES, min(block_q, ((Sq + LANES - 1) // LANES) * LANES))
    block_k = max(LANES, min(block_k, ((Skv + LANES - 1) // LANES) * LANES))
    qf = _pad_to(_pad_to(q.reshape(B * H, Sq, D), block_q, 1), LANES, 2)
    kf = _pad_to(_pad_to(k.reshape(B * H, Skv, D), block_k, 1), LANES, 2)
    vf = _pad_to(_pad_to(v.reshape(B * H, Skv, D), block_k, 1), LANES, 2)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q,
            block_k=block_k, kv_valid=Skv),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=(qf.shape[0], qf.shape[1] // block_q, kf.shape[1] // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, qf.shape[2]),
                         lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, kf.shape[2]),
                         lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, vf.shape[2]),
                         lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, qf.shape[2]),
                               lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, qf.shape[2]), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qf, kf, vf)
    return out[:, :Sq, :D].reshape(B, H, Sq, D)


def _fwd_rule(q, k, v, sm_scale, causal, block_q, block_k):
    out = _flash_attention_impl(q, k, v, sm_scale, causal, block_q, block_k)
    return out, (q, k, v)


def _bwd_rule(sm_scale, causal, block_q, block_k, res, g):
    q, k, v = res

    def ref(q, k, v):
        B, H, Sq, D = q.shape
        return _reference_attention(
            q.reshape(B * H, Sq, D), k.reshape(B * H, -1, D),
            v.reshape(B * H, -1, D), sm_scale, causal, k.shape[2]
        ).reshape(q.shape)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd_rule, _bwd_rule)


def mha_flash(q, k, v, heads: int, sm_scale: Optional[float] = None,
              causal: bool = False) -> jnp.ndarray:
    """(B, S, D_model) convenience wrapper: split heads, flash, merge."""
    B, S, Dm = q.shape
    hd = Dm // heads
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(hd))
    def split(x):
        return x.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
    out = flash_attention(split(q), split(k), split(v), sm_scale, causal)
    return out.transpose(0, 2, 1, 3).reshape(B, S, Dm)
