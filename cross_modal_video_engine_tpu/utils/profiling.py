"""Profiling / tracing.

The reference has only wall-clock meters (SURVEY §5).  Here:
  * `trace(logdir)` — context manager around jax.profiler for XLA/TPU
    traces viewable in TensorBoard/Perfetto;
  * `StageTimer` — per-stage host timing that correctly synchronizes
    device work (fetches a scalar) before stamping;
  * `device_time` — time a jitted fn's device execution via an
    in-jit repetition loop, robust to async dispatch relays where
    block_until_ready does not block (see .claude/skills/verify).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                np.asarray(sync_value)  # force device sync
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_s": v / self.counts[k]}
                for k, v in self.totals.items()}


def device_time(fn: Callable, *args, steps: int = 10,
                perturb_argnums: Optional[tuple] = None) -> float:
    """Seconds per call of `fn(*args)` measured with an in-jit loop and a
    single synchronizing host fetch.

    To stop XLA hoisting the body out of the loop, the args listed in
    `perturb_argnums` (default: all) get a dtype-preserving data
    dependency on the loop carry: `select(pred(carry), x, zeros)` — the
    branches DIFFER, so the select cannot be simplified away (the earlier
    `select(p, x, x)` form was folded to `x` and let XLA hoist the whole
    body, inflating throughput numbers past chip peak).  The select costs
    one copy of the perturbed arg per iteration — measurements are
    correspondingly conservative.  Leave big LOOP-INVARIANT operands (a
    multi-GB index, the params tree) OUT of perturb_argnums: perturbing
    them measures memcpy, not your function.
    """
    import jax
    import jax.numpy as jnp

    idxs = (tuple(range(len(args))) if perturb_argnums is None
            else tuple(perturb_argnums))
    # at least one arg MUST carry the loop dependency — with none, XLA
    # hoists the whole body and the time reads ~steps-times too small
    # (the exact inflation bug this function exists to guard against)
    assert idxs, "perturb_argnums must name at least one argument"

    @jax.jit
    def run(*a):
        def body(i, carry):
            dep = jnp.isfinite(carry)  # dynamic; never provably constant
            perturbed = [
                jax.tree.map(
                    lambda x: jnp.where(dep, x, jnp.zeros_like(x)), arg)
                if j in idxs else arg
                for j, arg in enumerate(a)]
            out = fn(*perturbed)
            # fold EVERY output leaf into the carry so no part of fn is
            # dead-code-eliminated
            leaves = jax.tree.leaves(out)
            return sum(jnp.asarray(l, jnp.float32).mean() for l in leaves)
        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    np.asarray(run(*args))             # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / steps
