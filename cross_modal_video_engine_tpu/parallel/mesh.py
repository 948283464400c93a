"""Device mesh and sharding helpers.

The reference scales with torch.distributed NCCL process groups
(MCT default_runtime.py dist_params, dist_train.sh launchers).  Here a
single `jax.sharding.Mesh` covers every parallelism axis; gradient sync,
eval gather and contrastive all-gather become XLA collectives over ICI
inserted by GSPMD — no launcher, no process groups.

Axes convention:
  data   -- batch / index-row sharding (DDP + sharded retrieval index)
  model  -- tensor parallel for wide layers (unused at reference scale,
            wired so larger towers can shard without API changes)
"""

from __future__ import annotations

from typing import Optional, Sequence

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def make_multislice_mesh(n_model: int = 1,
                         devices: Optional[Sequence[jax.Device]] = None,
                         slice_index_fn=None) -> Mesh:
    """(dcn, data, model) mesh for multi-slice pods: the leading axis maps
    across slices (DCN) so data parallelism's gradient psum crosses DCN
    once while tensor collectives stay on ICI within a slice.  Slice count
    is discovered from device.slice_index (1 on single-slice/CPU).

    ``slice_index_fn(device) -> int`` overrides the discovery — used by
    the CPU-mesh dryrun/tests to fake a slice partition on virtual
    devices (which have no slice_index).  Batches shard over
    ('dcn', 'data') jointly (shardings.batch_spec / mesh.data_sharding
    handle this), so the gradient all-reduce XLA inserts is hierarchical:
    ICI within each slice row, one DCN hop across rows."""
    devices = list(devices if devices is not None else jax.devices())
    get_slice = slice_index_fn or (lambda d: getattr(d, "slice_index", 0))
    slice_ids = sorted({get_slice(d) for d in devices})
    n_slices = len(slice_ids)
    counts = {s: sum(1 for d in devices if get_slice(d) == s)
              for s in slice_ids}
    assert len(set(counts.values())) == 1, (
        f"uneven devices per slice {counts}: the (dcn, data, model) "
        f"reshape would put devices in the wrong slice row and ICI "
        f"collectives would silently cross DCN")
    per_slice = len(devices) // n_slices
    order = sorted(devices, key=lambda d: (get_slice(d), d.id))
    n_data = per_slice // n_model
    assert n_data >= 1, (
        f"n_model={n_model} exceeds the {per_slice} devices available "
        f"per slice; tensor parallelism cannot cross DCN")
    assert per_slice % n_model == 0, (
        f"n_model={n_model} does not divide the {per_slice} devices per "
        f"slice: truncating to {n_data}x{n_model} would pull devices "
        f"from the next slice into the previous dcn row and 'model' "
        f"collectives would silently cross DCN")
    dev_array = np.asarray(order).reshape(n_slices, n_data, n_model)
    return Mesh(dev_array, ("dcn", "data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading axis over 'data' (jointly over ('dcn', 'data')
    on a multi-slice mesh), replicate the rest."""
    lead = ("dcn", "data") if "dcn" in mesh.axis_names else "data"
    return NamedSharding(mesh, P(lead, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, x: jax.Array | np.ndarray, pad_value: float = 0.0):
    """Pad the leading axis to a multiple of the data-axis size and place
    the array row-sharded across the mesh.  Returns (sharded_array, n_valid)."""
    n = x.shape[0]
    d = mesh.shape["data"] * mesh.shape.get("dcn", 1)
    pad = (-n) % d
    if pad:
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(np.asarray(x), widths, constant_values=pad_value)
    return jax.device_put(x, data_sharding(mesh, x.ndim)), n


def host_gather(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly sharded) array fully to host."""
    return np.asarray(jax.device_get(x))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: ONE call per host replaces the reference's
    torch.distributed launcher stack (dist_train.sh NNODES/NODE_RANK/
    MASTER_ADDR + init_dist, SURVEY §2.4).  With no arguments, jax reads
    the cluster environment (TPU pods auto-discover; GPU/CPU clusters use
    JAX_COORDINATOR_ADDRESS etc).  Safe to call on a single host (no-op).
    Returns the process index."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception as exc:
            # single-process runs legitimately have nothing to
            # coordinate — but on a configured pod a silent fallback
            # would make every host train independently as process 0,
            # so surface the failure loudly when a cluster was asked for
            if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
                    os.environ.get("COORDINATOR_ADDRESS"):
                raise
            import logging
            logging.getLogger(__name__).debug(
                "jax.distributed.initialize skipped (%s); "
                "continuing single-process", exc)
    return jax.process_index()
