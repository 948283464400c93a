"""Distributed result collection.

Replaces the reference's NCCL/shared-FS gathers
(MCT/mmaction/apis/test.py:100-192 collect_results_cpu/gpu):

* `all_gather_results` — device-array gather over the mesh via
  jax.experimental.multihost_utils.process_allgather (falls back to
  identity single-process);
* `gather_object_results` — python-object gather through a shared
  directory + barrier, the collect_results_cpu analogue for host-side
  products (metric dicts, ranked id lists).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, List, Optional

import numpy as np


def all_gather_results(x) -> np.ndarray:
    import jax
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x))


def gather_object_results(obj: Any, tmpdir: str, rank: Optional[int] = None,
                          world_size: Optional[int] = None,
                          timeout_s: float = 600.0) -> Optional[List[Any]]:
    """Each process dumps its object; rank 0 collects the ordered list
    (others get None).  Shared-filesystem variant of collect_results_cpu
    (apis/test.py:100-158)."""
    import jax
    rank = jax.process_index() if rank is None else rank
    world_size = jax.process_count() if world_size is None else world_size
    os.makedirs(tmpdir, exist_ok=True)
    part = os.path.join(tmpdir, f"part_{rank}.json")
    tmp = part + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, part)   # atomic publish
    if rank != 0:
        return None
    out: List[Any] = []
    deadline = time.time() + timeout_s
    for r in range(world_size):
        p = os.path.join(tmpdir, f"part_{r}.json")
        while not os.path.exists(p):
            if time.time() > deadline:
                raise TimeoutError(f"missing gather part from rank {r}")
            time.sleep(0.05)
        with open(p) as f:
            out.append(json.load(f))
    return out
