"""Distributed result collection.

Replaces the reference's NCCL/shared-FS gathers
(MCT/mmaction/apis/test.py:100-192 collect_results_cpu/gpu):

* `all_gather_results` — device-array gather over the mesh via
  jax.experimental.multihost_utils.process_allgather (single-process
  falls back to the SAME (1, ...) leading-axis layout so caller code
  does not silently change shape when scaled out);
* `gather_object_results` — python-object gather through a shared
  directory, the collect_results_cpu analogue for host-side products
  (metric dicts, ranked id lists).  Each call is round-stamped so a
  reused tmpdir can never serve a previous round's part files.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, List, Optional

import numpy as np


def all_gather_results(x) -> np.ndarray:
    """Returns (process_count, ...) — the per-process axis is ALWAYS
    present (1 when single-process), so downstream indexing is
    identical on one host and on a pod."""
    import jax
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x))


def gather_object_results(obj: Any, tmpdir: str, rank: Optional[int] = None,
                          world_size: Optional[int] = None,
                          timeout_s: float = 600.0,
                          round_id: Optional[int] = None) -> Optional[List[Any]]:
    """Each process dumps its object; rank 0 collects the ordered list
    (others get None).  Shared-filesystem variant of collect_results_cpu
    (apis/test.py:100-158).

    round_id distinguishes repeated gathers into the same tmpdir
    (defaults to a persistent per-directory counter file each rank
    advances identically); part files carry it in the payload, so rank
    0 never attributes a previous round's file to this round, and it
    deletes the parts it consumed.
    """
    import jax
    rank = jax.process_index() if rank is None else rank
    world_size = jax.process_count() if world_size is None else world_size
    os.makedirs(tmpdir, exist_ok=True)
    if round_id is None:
        # every rank calls gather the same number of times in lockstep,
        # so a local per-process counter agrees across ranks
        counters = gather_object_results.__dict__.setdefault("_rounds", {})
        round_id = counters.get(tmpdir, 0)
        counters[tmpdir] = round_id + 1
    part = os.path.join(tmpdir, f"part_{rank}.json")
    tmp = part + f".tmp{rank}"
    with open(tmp, "w") as f:
        json.dump({"round": round_id, "obj": obj}, f)
    os.replace(tmp, part)   # atomic publish
    if rank != 0:
        return None
    out: List[Any] = []
    deadline = time.time() + timeout_s
    for r in range(world_size):
        p = os.path.join(tmpdir, f"part_{r}.json")
        while True:
            if os.path.exists(p):
                try:
                    with open(p) as f:
                        payload = json.load(f)
                except (json.JSONDecodeError, OSError):
                    payload = None   # mid-replace; retry
                if payload is not None and payload.get("round") == round_id:
                    out.append(payload["obj"])
                    if r != 0:
                        try:
                            os.remove(p)   # consumed; can't go stale
                        except OSError:
                            pass
                    break
            if time.time() > deadline:
                raise TimeoutError(
                    f"missing round-{round_id} gather part from rank {r}")
            time.sleep(0.05)
    return out
