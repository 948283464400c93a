"""Mixed-precision helpers.

``einsum_f32acc`` is ``jnp.einsum(..., preferred_element_type=f32)``
with torch-autocast backward semantics: the f32 cotangent is cast to the
operand dtype BEFORE the two gradient einsums.  Plain AD through an
f32-accumulated bf16 einsum feeds the f32 cotangent straight into the
grad dots, producing mixed (f32 x bf16) dot_generals that cannot run on
the MXU's bf16 path — ~2% of the TimeSformer train step's FLOPs ran at
the f32 rate before this (caught by tests/test_bench_builders.py; the
reference's torch AMP casts grads exactly like this, so parity training
curves are unaffected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _grad_patterns(pattern: str):
    ins, out = pattern.split("->")
    xa, xb = ins.split(",")
    # the string-derived grad rule is valid only when every operand
    # index is visible to the product or the other operand (no
    # diagonal/sum-only indices) — true for all attention patterns
    assert set(xa) <= set(out) | set(xb), pattern
    assert set(xb) <= set(out) | set(xa), pattern
    return xa, xb, out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def einsum_f32acc(pattern: str, a: jnp.ndarray, b: jnp.ndarray):
    """Binary einsum, f32 accumulation, autocast backward.  Output is
    f32 (cast at the call site, as with the plain einsum)."""
    _grad_patterns(pattern)           # validate even outside AD
    return jnp.einsum(pattern, a, b, preferred_element_type=jnp.float32)


def _fwd(pattern, a, b):
    return einsum_f32acc(pattern, a, b), (a, b)


def _bwd(pattern, res, g):
    a, b = res
    xa, xb, out = _grad_patterns(pattern)
    ga = jnp.einsum(f"{out},{xb}->{xa}", g.astype(b.dtype), b,
                    preferred_element_type=jnp.float32).astype(a.dtype)
    gb = jnp.einsum(f"{out},{xa}->{xb}", g.astype(a.dtype), a,
                    preferred_element_type=jnp.float32).astype(b.dtype)
    return ga, gb


einsum_f32acc.defvjp(_fwd, _bwd)
