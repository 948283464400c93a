"""CPU smoke for the TPU evidence scripts (bench_extra / bench_profile /
bench_roofline).

The evidence run (`scripts/run_tpu_evidence.sh`) aborts on the FIRST
failing row (`set -uo pipefail`), so a Python-level bug in any row wastes
a whole TPU tunnel window.  This script executes every row function at
tiny shapes on the 8-device virtual CPU mesh — trace errors, shape bugs,
API drift, and harness mistakes surface here, on the host, for free.
Timings printed by the rows are meaningless on CPU; only completion is
asserted.

Run: `python scripts/smoke_bench_cpu.py` (~10-30 min on the 1-core box,
dominated by the full-shape TimeSformer fwd+bwd; set SMOKE_SKIP_HEAVY=1
to skip the two full-224 train rows).
"""

import os
import sys
import time
import traceback

# append (not setdefault): a pre-set XLA_FLAGS must not silently drop
# the 8-device mesh the sharded rows exist to exercise (conftest.py:12)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                            # noqa: E402

# the JAX_PLATFORMS env var alone does NOT override the preset axon
# platform (CLAUDE.md gotcha — the hung process probes the tunnel
# forever when it is down); the config.update call is required
jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl             # noqa: E402

# flash_attention targets the TPU backend explicitly; run its kernels in
# the Pallas interpreter here (same patch as tests/test_flash_attention).
_orig_pallas_call = pl.pallas_call


def _interp_pallas_call(*args, **kwargs):
    kwargs.setdefault("interpret", True)
    return _orig_pallas_call(*args, **kwargs)


pl.pallas_call = _interp_pallas_call

import bench_extra                                    # noqa: E402
import bench_profile                                  # noqa: E402
import bench_roofline                                 # noqa: E402

FAILED = []


def run(name, fn, *args, **kwargs):
    t0 = time.perf_counter()
    print(f"--- smoke: {name}", file=sys.stderr, flush=True)
    try:
        fn(*args, **kwargs)
    except Exception:
        traceback.print_exc()
        FAILED.append(name)
        print(f"--- smoke: {name} FAILED", file=sys.stderr, flush=True)
        return
    print(f"--- smoke: {name} ok ({time.perf_counter() - t0:.1f}s)",
          file=sys.stderr, flush=True)


run("retrieval_p50", bench_extra.bench_retrieval_p50,
    n_rows=4096, dim=64, n_queries=4, k=5, trials=1, steps=2)
run("int8_capacity", bench_extra.bench_int8_capacity,
    n_rows=8192, dim=64, n_queries=4, k=5, trials=1, steps=2)
run("flash_sweep", bench_extra.bench_flash_sweep,
    batch=1, heads=2, head_dim=64, seq_lens=(256,), steps=2)
run("flatten_tokens_ab", bench_extra.bench_flatten_tokens_ab,
    batch=2, frames=2, steps=2)
run("text_tower", bench_extra.bench_text_tower, batch=4, steps=2)
run("u8_ingest", bench_extra.bench_u8_ingest, batch=2, frames=2, steps=2)
run("host_feed", bench_extra.bench_host_feed,
    n_videos=4, frames=2, batch=2, src_hw=(96, 128), workers_sweep=(1, 2))
if not os.environ.get("SMOKE_SKIP_HEAVY"):
    # these two keep their full 224 spatial shape (not parametrized —
    # they ARE the production rows); minutes on CPU, fine in background
    run("train_step_timesformer", bench_extra.bench_train_step_timesformer,
        batch=1, steps=2)
    run("train_step_slowfast", bench_extra.bench_train_step_slowfast,
        batch=1, frames=16, steps=2)
run("train_step_yolov5", bench_extra.bench_train_step_yolov5,
    batch=2, img=64, max_targets=4, steps=2)
run("train_step_yolov5_seg", bench_extra.bench_train_step_yolov5_seg,
    batch=2, img=64, max_targets=4, steps=2)

# quick=False on purpose: the non-quick branches (beta_inv sweep, s2d
# stem rows) are exactly the never-yet-executed A/B code paths
run("profile_slowfast", bench_profile.profile_slowfast,
    batch=1, frames=16, steps=2, quick=False)
run("profile_yolo", bench_profile.profile_yolo,
    batch=2, img=64, max_targets=4, steps=2, quick=False)
run("profiler_trace", bench_profile.try_profiler_trace)

run("roofline", bench_roofline.main)

if FAILED:
    print(f"SMOKE FAILED: {FAILED}", file=sys.stderr)
    sys.exit(1)
print("SMOKE OK", file=sys.stderr)
