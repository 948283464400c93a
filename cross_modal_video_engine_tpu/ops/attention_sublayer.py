"""Fused attention sublayer (Pallas): y = x + W_o·attn(LN(x)) in ONE
HBM round-trip per chunk.

docs/PERF.md's analytic roofline shows the CLIP flagship at S=50 is
bandwidth/fusion-limited: the XLA path materializes ln_1, q/k/v, the
per-head transposes and the attention output in HBM every layer (the
measured step sits mid-way between the fused/unfused byte brackets).
This kernel keeps the whole sublayer resident in VMEM for a chunk of
sequences: one read of x, one read of the four weight matrices, one
write of y.  Budget per chunk (G sequences of LP tokens, D=768):
4 weight mats 4.7 MB + x/q/k/v/out chunks ~5x(G·LP·D·2B) — G is chosen
to keep this under the ~16 MB VMEM core budget.

Contract (vs models/clip.py MHA + LayerNormF32):
  * x: (B, LP, D) with LP a multiple of the 16-row bf16 tile; rows
    >= valid_len are padding — masked out as KEYS, passed through as
    queries (their outputs are never read downstream).
  * LN statistics in fp32 (LayerNormF32 semantics), softmax in fp32,
    GEMMs accumulate fp32 (preferred_element_type), activations carry
    x.dtype — numerically matching the unfused bf16/f32 paths.
  * causal=True adds the text tower's triangular mask.
  * Opt-in via CLIPConfig.fused_attn — bench.py and the serving CLIs
    (enable_fused_inference) turn it on after the on-chip A/Bs
    (docs/PERF.md: vision +62%, text +24% vs the unfused tower);
    parity pinned by tests/test_attention_sublayer.py.
  * fused_attention_sublayer_compact is the headline variant: flat
    (B*L, D) rows with NO pad rows — the L=50->64 sublane pad taxed
    every GEMM 28% — staging q/k/v into padded VMEM scratch only for
    the per-head attention.
  * Differentiable: pallas_call has no reverse-mode rule, so both
    sublayers carry a custom_vjp whose backward is the vjp of the same
    math in plain jnp (_attn_ref/_mlp_ref) — training through a fused
    model costs one extra unfused forward in the backward pass and
    produces the unfused path's exact gradients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_chunk(batch: int, lp: int, max_rows: int = 512) -> int:
    """Sequences per grid step: largest divisor of `batch` keeping the
    row-block under `max_rows` (VMEM budget; 512x768 bf16 x ~5 live
    buffers ~= 4 MB + 4.7 MB weights)."""
    g = max(1, min(batch, max_rows // lp))
    while batch % g:
        g -= 1
    return g


def _ln_f32(xb: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
            eps: float) -> jnp.ndarray:
    """LayerNormF32 semantics (fp32 statistics, output in x.dtype) —
    the one copy both fused kernels and their reference-math backward
    passes share."""
    xf = xb.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(xb.dtype)


def _kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wo_ref, bo_ref, o_ref, att_ref, *,
            g_seqs: int, lp: int, heads: int, valid_len: int,
            causal: bool, eps: float):
    dt = x_ref.dtype
    xb = x_ref[...]
    ln = _ln_f32(xb, lns_ref[...], lnb_ref[...], eps)
    q = (jnp.dot(ln, wq_ref[...], preferred_element_type=jnp.float32)
         + bq_ref[...].astype(jnp.float32)).astype(dt)
    k = (jnp.dot(ln, wk_ref[...], preferred_element_type=jnp.float32)
         + bk_ref[...].astype(jnp.float32)).astype(dt)
    v = (jnp.dot(ln, wv_ref[...], preferred_element_type=jnp.float32)
         + bv_ref[...].astype(jnp.float32)).astype(dt)

    d = q.shape[-1]
    hd = d // heads
    scale = jnp.float32(1.0 / np.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    mask = jnp.where(col < valid_len, 0.0, -1e30).astype(jnp.float32)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
        mask = mask + jnp.where(col <= row, 0.0, -1e30)

    for g in range(g_seqs):
        rows = slice(g * lp, (g + 1) * lp)
        for h in range(heads):
            cols = slice(h * hd, (h + 1) * hd)
            qs, ks, vs = q[rows, cols], k[rows, cols], v[rows, cols]
            sc = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            pr = jax.nn.softmax(sc + mask, axis=-1).astype(dt)
            att_ref[rows, cols] = jnp.dot(
                pr, vs, preferred_element_type=jnp.float32).astype(dt)

    y = (jnp.dot(att_ref[...], wo_ref[...],
                 preferred_element_type=jnp.float32)
         + bo_ref[...].astype(jnp.float32)).astype(dt) + xb
    o_ref[...] = y


def _attn_pallas(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, *,
                 heads: int, valid_len: int, causal: bool, eps: float,
                 interpret: bool) -> jnp.ndarray:
    b, lp, d = x.shape
    g = _pick_chunk(b, lp)
    rows = g * lp
    dt = x.dtype

    def _w(m):
        return m.astype(dt)

    def _b(m):
        return m.reshape(1, -1).astype(dt)

    kern = functools.partial(_kernel, g_seqs=g, lp=lp, heads=heads,
                             valid_len=valid_len, causal=causal, eps=eps)
    const = pl.BlockSpec((d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b * lp, d), dt),
        grid=(b // g,),
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec, vec, const, vec, const, vec, const, vec,
                  const, vec],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, d), dt)],
        interpret=interpret,
    )(x.reshape(b * lp, d), _b(ln_scale), _b(ln_bias),
      _w(wq), _b(bq), _w(wk), _b(bk), _w(wv), _b(bv), _w(wo), _b(bo))
    return out.reshape(b, lp, d)


def _attn_ref(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, *,
              heads: int, valid_len: int, causal: bool, eps: float
              ) -> jnp.ndarray:
    """The kernel's math in plain jnp (same casts, same fp32 accum) —
    the backward pass differentiates THIS, so the fused sublayer trains
    with the unfused path's exact gradients."""
    b, lp, d = x.shape
    dt = x.dtype
    hd = d // heads

    def _dense(a, w, bb):
        return (jnp.dot(a, w.astype(dt),
                        preferred_element_type=jnp.float32)
                + bb.astype(dt).astype(jnp.float32)).astype(dt)

    ln = _ln_f32(x, ln_scale, ln_bias, eps)
    q = _dense(ln, wq, bq).reshape(b, lp, heads, hd)
    k = _dense(ln, wk, bk).reshape(b, lp, heads, hd)
    v = _dense(ln, wv, bv).reshape(b, lp, heads, hd)
    sc = jnp.einsum("bqhc,bkhc->bhqk", q, k,
                    preferred_element_type=jnp.float32)
    sc = sc * jnp.float32(1.0 / np.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    mask = jnp.where(col < valid_len, 0.0, -1e30).astype(jnp.float32)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
        mask = mask + jnp.where(col <= row, 0.0, -1e30)
    pr = jax.nn.softmax(sc + mask, axis=-1).astype(dt)
    att = jnp.einsum("bhqk,bkhc->bqhc", pr, v,
                     preferred_element_type=jnp.float32).astype(dt)
    return _dense(att.reshape(b, lp, d), wo, bo) + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _attn_vjp(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, cfg):
    return _attn_pallas(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
                        wo, bo, heads=cfg[0], valid_len=cfg[1],
                        causal=cfg[2], eps=cfg[3], interpret=cfg[4])


def _attn_fwd(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, cfg):
    args = (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)
    return _attn_pallas(*args, heads=cfg[0], valid_len=cfg[1],
                        causal=cfg[2], eps=cfg[3],
                        interpret=cfg[4]), args


def _attn_bwd(cfg, res, g):
    _, vjp = jax.vjp(
        lambda *a: _attn_ref(*a, heads=cfg[0], valid_len=cfg[1],
                             causal=cfg[2], eps=cfg[3]), *res)
    return vjp(g)


_attn_vjp.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(jax.jit, static_argnames=(
    "heads", "valid_len", "causal", "eps", "interpret"))
def fused_attention_sublayer(x: jnp.ndarray,
                             ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                             wq: jnp.ndarray, bq: jnp.ndarray,
                             wk: jnp.ndarray, bk: jnp.ndarray,
                             wv: jnp.ndarray, bv: jnp.ndarray,
                             wo: jnp.ndarray, bo: jnp.ndarray, *,
                             heads: int, valid_len: int,
                             causal: bool = False, eps: float = 1e-5,
                             interpret: bool | None = None) -> jnp.ndarray:
    """x: (B, LP, D) -> (B, LP, D); rows >= valid_len are padding.
    interpret=None auto-selects the Pallas interpreter off-TPU so the
    fused model stays runnable in the CPU test mesh.  Differentiable:
    the backward pass is the vjp of the reference math (recomputes the
    unfused forward — same cost profile as training the unfused path)."""
    if interpret is None:
        # 'axon' is the remote-TPU relay backend (runs real kernels)
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _attn_vjp(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                     (heads, valid_len, bool(causal), float(eps),
                      bool(interpret)))


def _compact_chunk(n_seqs: int, l: int, max_rows: int = 512,
                   min_rows: int = 256) -> int | None:
    """Sequences per grid step for the COMPACT (unpadded) kernel: the
    smallest g dividing `n_seqs` with g*l a bf16 sublane multiple (16)
    and min_rows <= g*l <= max_rows.  Smallest-g minimizes the
    block-diagonal softmax waste (the masked (g*l)^2 scores grow with
    g); min_rows keeps the projection GEMMs MXU-sized.  If no g reaches
    min_rows, falls back to the LARGEST feasible g below it (closest to
    MXU-sized).  None when no feasible g exists at all — callers fall
    back to the padded kernel."""
    best = None
    for g in range(1, n_seqs + 1):
        r = g * l
        if r > max_rows:
            break
        if r % 16 == 0 and n_seqs % g == 0:
            if r >= min_rows:
                return g
            best = g           # feasible but small — keep looking
    return best


def _attn_body_compact(xb, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref,
                       bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                       qp_ref, kp_ref, vp_ref, ap_ref, att_ref, *,
                       g: int, l: int, lp: int, heads: int,
                       causal: bool, eps: float):
    """Compact attention-sublayer math on one row chunk, shared by
    _kernel_compact and _block_kernel_compact (ONE site owns the
    invariants: k/v pad-row zeroing — garbage there turns
    exp(-1e30)*NaN into NaN — the block-diagonal mask, and the lp
    staging copies).  Returns y = x + W_o·attn(LN(x)) as a value."""
    dt = xb.dtype
    ln = _ln_f32(xb, lns_ref[...], lnb_ref[...], eps)
    q = (jnp.dot(ln, wq_ref[...], preferred_element_type=jnp.float32)
         + bq_ref[...].astype(jnp.float32)).astype(dt)
    k = (jnp.dot(ln, wk_ref[...], preferred_element_type=jnp.float32)
         + bk_ref[...].astype(jnp.float32)).astype(dt)
    v = (jnp.dot(ln, wv_ref[...], preferred_element_type=jnp.float32)
         + bv_ref[...].astype(jnp.float32)).astype(dt)

    zero = jnp.zeros_like(kp_ref)
    kp_ref[...] = zero
    vp_ref[...] = zero
    for s in range(g):
        qp_ref[s * lp:s * lp + l, :] = q[s * l:(s + 1) * l, :]
        kp_ref[s * lp:s * lp + l, :] = k[s * l:(s + 1) * l, :]
        vp_ref[s * lp:s * lp + l, :] = v[s * l:(s + 1) * l, :]

    d = q.shape[-1]
    hd = d // heads
    scale = jnp.float32(1.0 / np.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    mask = jnp.where(col < l, 0.0, -1e30).astype(jnp.float32)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
        mask = mask + jnp.where(col <= row, 0.0, -1e30)

    for s in range(g):
        rows = slice(s * lp, (s + 1) * lp)
        for h in range(heads):
            cols = slice(h * hd, (h + 1) * hd)
            qs, ks, vs = (qp_ref[rows, cols], kp_ref[rows, cols],
                          vp_ref[rows, cols])
            sc = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            pr = jax.nn.softmax(sc + mask, axis=-1).astype(dt)
            ap_ref[rows, cols] = jnp.dot(
                pr, vs, preferred_element_type=jnp.float32).astype(dt)
    for s in range(g):
        att_ref[s * l:(s + 1) * l, :] = ap_ref[s * lp:s * lp + l, :]

    return (jnp.dot(att_ref[...], wo_ref[...],
                    preferred_element_type=jnp.float32)
            + bo_ref[...].astype(jnp.float32)).astype(dt) + xb


def _kernel_compact(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref,
                    bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, o_ref,
                    qp_ref, kp_ref, vp_ref, ap_ref, att_ref, *,
                    g: int, l: int, lp: int, heads: int, causal: bool,
                    eps: float):
    """Compact-rows variant: the row block holds g whole sequences of l
    tokens with NO pad rows, so the LN, the four projection GEMMs and
    the HBM traffic cover exactly the useful rows (at L=50 the padded
    kernel wastes 28% of both).  Only the small per-head attention
    needs 16-row alignment: q/k/v are staged into a sublane-padded
    VMEM scratch, attended per sequence exactly like the padded
    kernel, and un-padded back before the output projection.  The
    on-chip A/B vs a block-diagonal (g*l, g*l) masked-scores
    formulation measured the staging copies cheaper than the g x
    softmax/scores waste (docs/PERF.md r4)."""
    o_ref[...] = _attn_body_compact(
        x_ref[...], lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
        wv_ref, bv_ref, wo_ref, bo_ref, qp_ref, kp_ref, vp_ref, ap_ref,
        att_ref, g=g, l=l, lp=lp, heads=heads, causal=causal, eps=eps)


def _attn_pallas_compact(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
                         wo, bo, *, heads: int, seq_len: int, g: int,
                         causal: bool, eps: float,
                         interpret: bool) -> jnp.ndarray:
    n, d = x.shape
    rows = g * seq_len
    if n % rows != 0:
        raise ValueError(
            f"compact kernel needs g*seq_len ({g}*{seq_len}={rows}) to "
            f"divide the total row count {n}; trailing rows would be "
            f"silently left unwritten otherwise")
    lp = -(-seq_len // 16) * 16
    dt = x.dtype

    def _w(m):
        return m.astype(dt)

    def _b(m):
        return m.reshape(1, -1).astype(dt)

    kern = functools.partial(_kernel_compact, g=g, l=seq_len, lp=lp,
                             heads=heads, causal=causal, eps=eps)
    const = pl.BlockSpec((d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, d), dt),
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec, vec, const, vec, const, vec, const, vec,
                  const, vec],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((g * lp, d), dt) for _ in range(4)]
                       + [pltpu.VMEM((rows, d), dt)],
        interpret=interpret,
    )(x, _b(ln_scale), _b(ln_bias),
      _w(wq), _b(bq), _w(wk), _b(bk), _w(wv), _b(bv), _w(wo), _b(bo))


def _attn_ref_flat(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                   *, heads: int, seq_len: int, causal: bool,
                   eps: float) -> jnp.ndarray:
    """Reference math for the compact kernel: same as _attn_ref on the
    (B, L, D) view — no pad rows, so valid_len == seq_len."""
    n, d = x.shape
    y = _attn_ref(x.reshape(n // seq_len, seq_len, d), ln_scale, ln_bias,
                  wq, bq, wk, bk, wv, bv, wo, bo, heads=heads,
                  valid_len=seq_len, causal=causal, eps=eps)
    return y.reshape(n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _attn_vjp_flat(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                   cfg):
    return _attn_pallas_compact(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
        heads=cfg[0], seq_len=cfg[1], g=cfg[2], causal=cfg[3],
        eps=cfg[4], interpret=cfg[5])


def _attn_flat_fwd(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                   cfg):
    args = (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)
    return _attn_vjp_flat(*args, cfg), args


def _attn_flat_bwd(cfg, res, grad):
    _, vjp = jax.vjp(
        lambda *a: _attn_ref_flat(*a, heads=cfg[0], seq_len=cfg[1],
                                  causal=cfg[3], eps=cfg[4]), *res)
    return vjp(grad)


_attn_vjp_flat.defvjp(_attn_flat_fwd, _attn_flat_bwd)


@functools.partial(jax.jit, static_argnames=(
    "heads", "seq_len", "g", "causal", "eps", "interpret"))
def fused_attention_sublayer_compact(
        x: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
        wq: jnp.ndarray, bq: jnp.ndarray, wk: jnp.ndarray,
        bk: jnp.ndarray, wv: jnp.ndarray, bv: jnp.ndarray,
        wo: jnp.ndarray, bo: jnp.ndarray, *, heads: int, seq_len: int,
        g: int, causal: bool = False, eps: float = 1e-5,
        interpret: bool | None = None) -> jnp.ndarray:
    """Compact fused attention sublayer: x is FLAT (B*seq_len, D) with
    NO pad rows (use _compact_chunk to pick g; callers fall back to
    fused_attention_sublayer when it returns None).  Eliminates the
    L -> 16-row-tile padding tax (28% of all GEMM MACs and stored bytes
    at L=50) by separating sequences with a block-diagonal mask instead
    of pad rows.  Differentiable via the reference-math vjp."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _attn_vjp_flat(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
        (heads, seq_len, g, bool(causal), float(eps), bool(interpret)))


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps: float):
    dt = x_ref.dtype
    xb = x_ref[...]
    ln = _ln_f32(xb, lns_ref[...], lnb_ref[...], eps)
    h = (jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32)
         + b1_ref[...].astype(jnp.float32))
    # quick_gelu in f32: Mosaic rejects logistic on bf16 vectors
    # ('vector.broadcast' element-type mismatch), and staying in f32
    # until after the nonlinearity drops one rounding anyway
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(dt)
    y = (jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
         + b2_ref[...].astype(jnp.float32)).astype(dt) + xb
    o_ref[...] = y


def _pick_rows(n: int, max_rows: int = 512) -> int:
    """Row block for the MLP kernel: largest divisor of n that is a
    multiple of the 16-row bf16 sublane and <= max_rows (VMEM: W1+W2
    ~9.4 MB bf16 at D=768 + ~3 MB of row blocks).  When n has no such
    divisor the caller pads n up to a multiple of the returned block
    (never more than max_rows) — returning n itself would put the whole
    array in one block and blow the VMEM budget."""
    r = min(n, max_rows)
    while r > 16 and (n % r or r % 16):
        r -= 1
    if n % r == 0 and r % 16 == 0:
        return r
    return min(-(-n // 16) * 16, max_rows)


def _mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, *, eps: float,
                interpret: bool) -> jnp.ndarray:
    shape = x.shape
    d = shape[-1]
    dh = w1.shape[-1]
    n = int(np.prod(shape[:-1]))
    r = _pick_rows(n)
    n_pad = -(-n // r) * r
    dt = x.dtype

    def _b(m):
        return m.reshape(1, -1).astype(dt)

    xr = x.reshape(n, d)
    if n_pad != n:
        # zero pad rows: LN maps them to the bias, the MLP to finite
        # garbage; they are sliced off below and never read
        xr = jnp.pad(xr, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), dt),
        grid=(n_pad // r,),
        in_specs=[pl.BlockSpec((r, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, dh), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, dh), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dh, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, _b(ln_scale), _b(ln_bias), w1.astype(dt), _b(b1),
      w2.astype(dt), _b(b2))
    return out[:n].reshape(shape)


def _mlp_ref(x, ln_scale, ln_bias, w1, b1, w2, b2, *, eps: float
             ) -> jnp.ndarray:
    """The MLP kernel's math in plain jnp — backward-pass source."""
    dt = x.dtype
    ln = _ln_f32(x, ln_scale, ln_bias, eps)
    h = (jnp.dot(ln, w1.astype(dt), preferred_element_type=jnp.float32)
         + b1.astype(dt).astype(jnp.float32))
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(dt)    # quick_gelu (f32)
    return (jnp.dot(h, w2.astype(dt), preferred_element_type=jnp.float32)
            + b2.astype(dt).astype(jnp.float32)).astype(dt) + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _mlp_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2, cfg):
    return _mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2,
                       eps=cfg[0], interpret=cfg[1])


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, cfg):
    args = (x, ln_scale, ln_bias, w1, b1, w2, b2)
    return _mlp_pallas(*args, eps=cfg[0], interpret=cfg[1]), args


def _mlp_bwd(cfg, res, g):
    _, vjp = jax.vjp(lambda *a: _mlp_ref(*a, eps=cfg[0]), *res)
    return vjp(g)


_mlp_vjp.defvjp(_mlp_fwd, _mlp_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_sublayer(x: jnp.ndarray, ln_scale: jnp.ndarray,
                       ln_bias: jnp.ndarray, w1: jnp.ndarray,
                       b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray,
                       *, eps: float = 1e-5,
                       interpret: bool | None = None) -> jnp.ndarray:
    """y = x + W2·gelu(W1·LN(x)) in one HBM round-trip per row chunk.
    Purely per-token, so any leading shape works: (B, L, D) or (N, D).
    The other half of the block docs/PERF.md's fused/unfused bracket
    charges (ln_2 + the 4x-wide hidden otherwise materialized).
    Differentiable via the reference-math vjp (see
    fused_attention_sublayer)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _mlp_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2,
                    (float(eps), bool(interpret)))


# ---------------------------------------------------------------------------
# whole-block fusion: attn sublayer + MLP sublayer in ONE kernel
# (r4 verdict item: the headline's last measured tax is the per-layer x
# round-trip between the two kernels, ~0.6 ms/step.  VMEM arithmetic at
# D=768 bf16: 14.2 MB of resident weights (4 attn mats 4.7 MB + W1+W2
# 9.4 MB) + row blocks + staging + the (rows, 4D) hidden — ~21 MB at the
# shipped g=8 geometry vs the ~16 MB core budget, so this kernel exists
# to MEASURE that boundary honestly: see docs/PERF.md for the on-chip
# keep/reject verdict at each feasible g.)
# ---------------------------------------------------------------------------

def _block_kernel_compact(x_ref, ln1s_ref, ln1b_ref, wq_ref, bq_ref,
                          wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                          ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                          b2_ref, o_ref, qp_ref, kp_ref, vp_ref, ap_ref,
                          att_ref, *, g: int, l: int, lp: int,
                          heads: int, causal: bool, eps: float):
    """One transformer block on a compact row chunk: y1 = the shared
    _attn_body_compact, then the _mlp_kernel math on y1 — x is read
    once and y written once per LAYER instead of per sublayer."""
    dt = x_ref.dtype
    y1 = _attn_body_compact(
        x_ref[...], ln1s_ref, ln1b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
        wv_ref, bv_ref, wo_ref, bo_ref, qp_ref, kp_ref, vp_ref, ap_ref,
        att_ref, g=g, l=l, lp=lp, heads=heads, causal=causal, eps=eps)

    # -- MLP half (== _mlp_kernel on y1, no HBM round-trip in between)
    ln2 = _ln_f32(y1, ln2s_ref[...], ln2b_ref[...], eps)
    hmid = (jnp.dot(ln2, w1_ref[...], preferred_element_type=jnp.float32)
            + b1_ref[...].astype(jnp.float32))
    hmid = (hmid * jax.nn.sigmoid(1.702 * hmid)).astype(dt)
    o_ref[...] = (jnp.dot(hmid, w2_ref[...],
                          preferred_element_type=jnp.float32)
                  + b2_ref[...].astype(jnp.float32)).astype(dt) + y1


def _block_pallas_compact(x, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
                          ln2s, ln2b, w1, b1, w2, b2, *, heads: int,
                          seq_len: int, g: int, causal: bool, eps: float,
                          interpret: bool) -> jnp.ndarray:
    n, d = x.shape
    dh = w1.shape[-1]
    rows = g * seq_len
    if n % rows != 0:
        raise ValueError(
            f"block kernel needs g*seq_len ({g}*{seq_len}={rows}) to "
            f"divide the total row count {n}")
    lp = -(-seq_len // 16) * 16
    dt = x.dtype

    def _w(m):
        return m.astype(dt)

    def _b(m):
        return m.reshape(1, -1).astype(dt)

    kern = functools.partial(_block_kernel_compact, g=g, l=seq_len, lp=lp,
                             heads=heads, causal=causal, eps=eps)
    const = pl.BlockSpec((d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vech = pl.BlockSpec((1, dh), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, d), dt),
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec, vec, const, vec, const, vec, const, vec,
                  const, vec,
                  vec, vec,
                  pl.BlockSpec((d, dh), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), vech,
                  pl.BlockSpec((dh, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), vec],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((g * lp, d), dt) for _ in range(4)]
                       + [pltpu.VMEM((rows, d), dt)],
        interpret=interpret,
    )(x, _b(ln1s), _b(ln1b),
      _w(wq), _b(bq), _w(wk), _b(bk), _w(wv), _b(bv), _w(wo), _b(bo),
      _b(ln2s), _b(ln2b), _w(w1), _b(b1), _w(w2), _b(b2))


def _block_ref_flat(x, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
                    ln2s, ln2b, w1, b1, w2, b2, *, heads: int,
                    seq_len: int, causal: bool, eps: float) -> jnp.ndarray:
    y1 = _attn_ref_flat(x, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
                        heads=heads, seq_len=seq_len, causal=causal,
                        eps=eps)
    return _mlp_ref(y1, ln2s, ln2b, w1, b1, w2, b2, eps=eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17,))
def _block_vjp_flat(x, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
                    ln2s, ln2b, w1, b1, w2, b2, cfg):
    return _block_pallas_compact(
        x, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
        ln2s, ln2b, w1, b1, w2, b2,
        heads=cfg[0], seq_len=cfg[1], g=cfg[2], causal=cfg[3],
        eps=cfg[4], interpret=cfg[5])


def _block_flat_fwd(x, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
                    ln2s, ln2b, w1, b1, w2, b2, cfg):
    args = (x, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
            ln2s, ln2b, w1, b1, w2, b2)
    return _block_vjp_flat(*args, cfg), args


def _block_flat_bwd(cfg, res, grad):
    _, vjp = jax.vjp(
        lambda *a: _block_ref_flat(*a, heads=cfg[0], seq_len=cfg[1],
                                   causal=cfg[3], eps=cfg[4]), *res)
    return vjp(grad)


_block_vjp_flat.defvjp(_block_flat_fwd, _block_flat_bwd)


@functools.partial(jax.jit, static_argnames=(
    "heads", "seq_len", "g", "causal", "eps", "interpret"))
def fused_block_sublayer_compact(
        x: jnp.ndarray, ln1s: jnp.ndarray, ln1b: jnp.ndarray,
        wq: jnp.ndarray, bq: jnp.ndarray, wk: jnp.ndarray,
        bk: jnp.ndarray, wv: jnp.ndarray, bv: jnp.ndarray,
        wo: jnp.ndarray, bo: jnp.ndarray, ln2s: jnp.ndarray,
        ln2b: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
        w2: jnp.ndarray, b2: jnp.ndarray, *, heads: int, seq_len: int,
        g: int, causal: bool = False, eps: float = 1e-5,
        interpret: bool | None = None) -> jnp.ndarray:
    """A whole transformer block (attn + MLP sublayers) in one Pallas
    kernel on the compact flat layout — saves the per-layer HBM
    round-trip of x between the two sublayer kernels, at the cost of
    keeping BOTH sublayers' weights VMEM-resident (see the section
    comment for the budget arithmetic).  Exact same math as
    fused_attention_sublayer_compact followed by fused_mlp_sublayer;
    differentiable via the reference-math vjp."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if x.shape[0] % (g * seq_len):
        raise ValueError(
            f"g*seq_len ({g}*{seq_len}) must divide rows {x.shape[0]}")
    return _block_vjp_flat(
        x, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wo, bo,
        ln2s, ln2b, w1, b1, w2, b2,
        (heads, seq_len, g, bool(causal), float(eps), bool(interpret)))


def pad_tokens(x: jnp.ndarray, sublane: int = 16
               ) -> Tuple[jnp.ndarray, int]:
    """Pad (B, L, D) to the next sublane multiple along L.  Returns
    (padded, L).  Pad rows are masked as keys inside the kernel and
    sliced off by the caller after the stack."""
    l = x.shape[1]
    lp = -(-l // sublane) * sublane
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    return x, l
