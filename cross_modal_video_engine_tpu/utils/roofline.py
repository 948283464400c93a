"""Analytic roofline for jitted steps: shape-derived FLOPs, MXU tile
efficiency and HBM traffic per op, without touching a device.

The axon relay cannot export device profiles (bench_profile.py falls
back when `jax.profiler.trace` comes back empty), but the question a
profile would answer for the conv families — WHERE does the non-MXU
time go (VERDICT r3: SlowFast ~7%, YOLOv5s ~11% MFU "structural is
asserted, not demonstrated") — is largely derivable from shapes alone:

  * every `conv_general_dilated` / `dot_general` eqn carries exact
    GEMM dimensions, so its FLOPs and its MXU *tile efficiency* (the
    fraction of useful MACs once M pads to the 8-deep sublane and K, N
    pad to the 128-wide lane/systolic tile) are computable;
  * every other eqn is elementwise/reduction traffic whose bytes bound
    its HBM time (BatchNorm stats, ReLU, padding, transposes).

`speed_of_light` turns the op list into step-time bounds on a chip
(peak bf16 FLOP/s + HBM GB/s): the tiled-compute bound exposes how much
MFU the conv shapes THEMSELVES forfeit (narrow channels under the
128-lane tile), and the fused/unfused memory bounds bracket the
BN/elementwise tax.  docs/PERF.md cites the resulting tables.

Usage (CPU tracing only — safe while the TPU is busy/down):

    costs = op_costs(jax.value_and_grad(loss_fn), params, batch)
    sol = speed_of_light(costs, peak_tflops=197.0, hbm_gbps=819.0)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, List, Tuple

import jax
import numpy as np
from jax.extend.core import ClosedJaxpr, Jaxpr

# TPU v5e-class tile geometry: 128-wide lanes (MXU edge) and 8-deep
# sublanes.  K and N pad to the 128 tile, M to the sublane depth.
LANE = 128
SUBLANE = 8


@dataclass
class OpCost:
    kind: str              # 'conv' | 'dot' | 'other'
    label: str             # primitive name + GEMM dims
    flops: float           # useful MACs*2 (0 for 'other')
    mxu_util: float        # useful/padded MAC ratio (1.0 for 'other')
    bytes: float           # operand + result bytes (unfused traffic)
    mult: int = 1          # loop multiplier already applied
    dtypes: tuple = ()     # operand dtype names (dot/conv only) — lets
                           # tests assert a "bf16" step really runs its
                           # MXU FLOPs on bf16 operands


def _nbytes(aval) -> float:
    try:
        return float(np.prod(aval.shape) * aval.dtype.itemsize)
    except Exception:       # abstract tokens etc. carry no bytes
        return 0.0


def _tile_util(m: int, k: int, n: int) -> float:
    """Useful-MAC fraction after padding (M->8, K,N->128).  This is the
    idealized XLA padding model: real layouts can dodge some padding
    (e.g. batched small GEMMs), so treat it as the structural ceiling's
    first-order term, not an exact figure."""
    pm = math.ceil(m / SUBLANE) * SUBLANE
    pk = math.ceil(k / LANE) * LANE
    pn = math.ceil(n / LANE) * LANE
    return (m * k * n) / float(pm * pk * pn)


def _conv_cost(eq, mult: int) -> OpCost:
    lhs, rhs = (v.aval for v in eq.invars[:2])
    out = eq.outvars[0].aval
    dn = eq.params["dimension_numbers"]
    groups = int(eq.params.get("feature_group_count", 1) or 1)
    batch_groups = int(eq.params.get("batch_group_count", 1) or 1)
    cin = lhs.shape[dn.lhs_spec[1]] // max(groups, 1)
    cout = out.shape[dn.out_spec[1]]
    kspatial = [rhs.shape[i] for i in dn.rhs_spec[2:]]
    out_elems = float(np.prod(out.shape))
    k = cin * int(np.prod(kspatial))
    flops = 2.0 * out_elems * k
    # per-group GEMM: M = output positions, K = cin/g * prod(k),
    # N = cout/g
    m = out_elems / max(cout, 1)
    util = _tile_util(int(m), int(k), int(cout // max(groups * batch_groups, 1)))
    by = sum(_nbytes(v.aval) for v in eq.invars) + _nbytes(out)
    return OpCost("conv", f"conv {tuple(lhs.shape)}x{tuple(rhs.shape)}"
                  f"->{tuple(out.shape)} M={int(m)} K={k} N={cout}",
                  flops * mult, util, by * mult, mult,
                  tuple(sorted({str(v.aval.dtype) for v in eq.invars[:2]})))


def _dot_cost(eq, mult: int) -> OpCost:
    lhs, rhs = (v.aval for v in eq.invars[:2])
    out = eq.outvars[0].aval
    (lc, rc), (lb, rb) = eq.params["dimension_numbers"]
    k = float(np.prod([lhs.shape[i] for i in lc])) or 1.0
    b = float(np.prod([lhs.shape[i] for i in lb])) or 1.0
    m = float(np.prod([lhs.shape[i] for i in range(lhs.ndim)
                       if i not in tuple(lc) + tuple(lb)])) or 1.0
    n = float(np.prod([rhs.shape[i] for i in range(rhs.ndim)
                       if i not in tuple(rc) + tuple(rb)])) or 1.0
    flops = 2.0 * b * m * n * k
    util = _tile_util(int(m), int(k), int(n))
    by = sum(_nbytes(v.aval) for v in eq.invars) + \
        sum(_nbytes(v.aval) for v in eq.outvars)
    return OpCost("dot", f"dot b={int(b)} M={int(m)} K={int(k)} N={int(n)}",
                  flops * mult, util, by * mult, mult,
                  tuple(sorted({str(v.aval.dtype) for v in eq.invars[:2]})))


def _walk(jaxpr: Jaxpr, mult: int, out: List[OpCost]) -> None:
    for eq in jaxpr.eqns:
        name = eq.primitive.name
        inner_mult = mult
        if name == "scan":
            inner_mult = mult * int(eq.params.get("length", 1))
        if name == "cond" and isinstance(eq.params.get("branches"),
                                         (tuple, list)):
            # only ONE branch executes: cost the most expensive one
            # (summing all branches would overstate every step that
            # carries a cond, e.g. conditional EMA/multigrid switches)
            best: List[OpCost] = []
            for br in eq.params["branches"]:
                cur: List[OpCost] = []
                _walk(br.jaxpr if isinstance(br, ClosedJaxpr) else br,
                      inner_mult, cur)
                if (sum(c.flops for c in cur), sum(c.bytes for c in cur)) \
                        > (sum(c.flops for c in best),
                           sum(c.bytes for c in best)):
                    best = cur
            out.extend(best)
            continue
        sub = [p for p in eq.params.values()
               if isinstance(p, (ClosedJaxpr, Jaxpr))]
        # while carries body+cond jaxprs (both walked: cond runs every
        # trip); other call-like primitives carry one jaxpr param
        for p in eq.params.values():
            if isinstance(p, (tuple, list)):
                sub.extend(x for x in p
                           if isinstance(x, (ClosedJaxpr, Jaxpr)))
        if sub:
            for s in sub:
                _walk(s.jaxpr if isinstance(s, ClosedJaxpr) else s,
                      inner_mult, out)
            continue
        if name == "conv_general_dilated":
            out.append(_conv_cost(eq, mult))
        elif name == "dot_general":
            out.append(_dot_cost(eq, mult))
        else:
            by = sum(_nbytes(v.aval) for v in eq.invars
                     if hasattr(v, "aval")) + \
                 sum(_nbytes(v.aval) for v in eq.outvars)
            out.append(OpCost("other", name, 0.0, 1.0, by * mult, mult))


def op_costs(fn: Callable, *args, **kwargs) -> List[OpCost]:
    """Trace `fn(*args)` (no execution) and cost every primitive.
    `while` bodies count once (trip counts are data-dependent); `scan`
    bodies are multiplied by their static length."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    out: List[OpCost] = []
    _walk(jaxpr.jaxpr, 1, out)
    return out


def speed_of_light(costs: List[OpCost], peak_tflops: float,
                   hbm_gbps: float) -> Dict[str, float]:
    """Step-time bounds (seconds) + the structural MFU ceiling.

    t_compute_ideal   every MAC at peak (the 100%-MFU fantasy)
    t_compute_tiled   MACs at peak / per-op tile efficiency — what the
                      GEMM shapes alone allow (narrow channels pad the
                      128-wide tile)
    t_mem_unfused     every eqn reads+writes HBM (no fusion: upper
                      bound on traffic)
    t_mem_fused       only MXU operands/results touch HBM (perfect
                      elementwise fusion: lower bound)
    mfu_ceiling       flops / (peak * max(t_compute_tiled, t_mem_fused))
    """
    peak = peak_tflops * 1e12
    bw = hbm_gbps * 1e9
    flops = sum(c.flops for c in costs)
    t_ideal = flops / peak
    t_tiled = sum(c.flops / (peak * max(c.mxu_util, 1e-9))
                  for c in costs if c.flops)
    mem_all = sum(c.bytes for c in costs)
    mem_mxu = sum(c.bytes for c in costs if c.kind in ("conv", "dot"))
    t_mem_unfused = mem_all / bw
    t_mem_fused = mem_mxu / bw
    t_floor = max(t_tiled, t_mem_fused)
    return {
        "flops": flops,
        "bytes_unfused": mem_all,
        "bytes_mxu": mem_mxu,
        "t_compute_ideal_s": t_ideal,
        "t_compute_tiled_s": t_tiled,
        "t_mem_unfused_s": t_mem_unfused,
        "t_mem_fused_s": t_mem_fused,
        "tile_efficiency": t_ideal / t_tiled if t_tiled else 1.0,
        "mfu_ceiling": (flops / (peak * t_floor)) if t_floor else 1.0,
    }


def worst_offenders(costs: List[OpCost], peak_tflops: float,
                    hbm_gbps: float, top: int = 10
                    ) -> List[Tuple[str, float, float]]:
    """(label, est_time_s, mxu_util) for the `top` ops by bound time —
    the table a profiler would have produced, sorted by cost."""
    peak = peak_tflops * 1e12
    bw = hbm_gbps * 1e9
    rows = []
    for c in costs:
        t = max(c.flops / (peak * max(c.mxu_util, 1e-9)) if c.flops
                else 0.0, c.bytes / bw)
        rows.append((c.label, t, c.mxu_util))
    rows.sort(key=lambda r: -r[1])
    return rows[:top]
