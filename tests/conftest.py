"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU devices
(xla_force_host_platform_device_count=8) since only one real TPU chip is
reachable; the driver separately dry-runs the multi-chip path.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

import jax  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="also run the full lane: heavy shape/parity tests whose "
             "coverage is duplicated by importer-parity or e2e tests")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: heavy test whose coverage is duplicated elsewhere; "
        "skipped unless --full is given (this box has ONE cpu core — "
        "wall-clock is the scarce resource)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full"):
        return
    skip = pytest.mark.skip(reason="full lane only (pytest --full)")
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip)

# the axon TPU plugin (PYTHONPATH sitecustomize) may have pinned the platform
# before this conftest runs; force CPU at the config level too.
jax.config.update("jax_platforms", "cpu")
# tests compare against float64-ish numpy references; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: on this 1-core box compile time
# dominates the suite, and most tests recompile identical programs run
# over run.  Warm reruns skip those compiles; cold runs are unaffected.
# Disable with CMVE_JAX_CACHE=0 (e.g. to time true cold-compile cost).
_cache = os.environ.get(
    "CMVE_JAX_CACHE", os.path.expanduser("~/.cache/cmve_jax_test_cache"))
if _cache and _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
