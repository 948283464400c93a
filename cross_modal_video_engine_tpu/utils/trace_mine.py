"""Mine `jax.profiler.trace` output for per-op device-time attribution.

The axon relay exports Chrome-format traces (`*.trace.json.gz` next to
the xplane.pb under `<dir>/plugins/profile/<ts>/`), so op-level
attribution works without TensorBoard: aggregate the complete ('X')
events on the device "XLA Ops" lane by op name.  This is the
instrument that attributed the r4 fused-sublayer step (MLP kernel
9.9 ms ~ 95% of padded-GEMM peak -> the remaining tax was the L=50->64
pad itself) and motivated the compact flat-token layout
(docs/PERF.md).  TPU-side analogue of the reference's
`torch.autograd.profiler` usage.

Typical use::

    with jax.profiler.trace("/tmp/my_trace"):
        np.asarray(step(...))          # ONE fetch inside the trace
    for r in device_op_table("/tmp/my_trace")[:10]:
        print(r)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple


def find_trace_file(path: str) -> str:
    """Resolve a profiler output dir (or a direct file path) to the
    newest `*.trace.json.gz` under it."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        hits = sorted(glob.glob(os.path.join(path, "**",
                                             "*.trace.json.gz"),
                                recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]


def load_events(path: str) -> List[dict]:
    """Load the Chrome-trace event list from a trace dir or file."""
    fn = find_trace_file(path)
    with gzip.open(fn, "rt") as f:
        return json.load(f)["traceEvents"]


def _lanes(events: List[dict]) -> Tuple[Dict[int, str],
                                        Dict[Tuple[int, int], str]]:
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    return pids, tids


def device_op_table(path: str, *, lane: str = "XLA Ops",
                    device_substr: str = "TPU",
                    strip_ids: bool = True,
                    steps: int = 1) -> List[dict]:
    """Aggregate device op durations by name, descending.

    Returns rows ``{"name", "ms", "ms_per_step", "count", "pct"}``
    where pct is of the lane total.  `strip_ids` folds numeric
    suffixes so `fusion.123` groups with `fusion`.  Control-flow
    wrapper ops (`while`, `conditional`) contain their bodies and are
    dropped from pct accounting via exclusion (reported separately
    with pct=None)."""
    events = load_events(path)
    pids, tids = _lanes(events)
    tot: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_substr not in pids.get(e.get("pid"), ""):
            continue
        if tids.get((e.get("pid"), e.get("tid"))) != lane:
            continue
        name = e["name"]
        if strip_ids:
            # fold only dot-prefixed numeric suffixes (`fusion.123`),
            # never bare trailing digits that are part of the op name
            # (`convert2` must not merge into `convert`)
            name = re.sub(r"(\.\d+)+$", "", name)
        tot[name] += e.get("dur", 0)
        cnt[name] += 1
    wrappers = {"while", "conditional", "call"}
    inner_total = sum(v for k, v in tot.items() if k not in wrappers)
    rows = []
    for name, us in tot.most_common():
        is_wrap = name in wrappers
        rows.append({
            "name": name,
            "ms": round(us / 1e3, 3),
            "ms_per_step": round(us / 1e3 / max(steps, 1), 3),
            "count": cnt[name],
            "pct": None if is_wrap or not inner_total
            else round(100.0 * us / inner_total, 1),
        })
    return rows


def format_table(rows: List[dict], top: Optional[int] = 12) -> str:
    out = [f"{'ms/step':>9}  {'pct':>5}  {'n':>5}  name"]
    for r in rows[:top]:
        pct = "wrap" if r["pct"] is None else f"{r['pct']:.1f}"
        out.append(f"{r['ms_per_step']:9.3f}  {pct:>5}  "
                   f"{r['count']:5d}  {r['name']}")
    return "\n".join(out)
