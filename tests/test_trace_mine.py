"""utils/trace_mine.py against a synthetic Chrome-format trace (the
shape the axon relay exports: metadata events naming the TPU process +
'XLA Ops' lane, 'X' complete events with us durations)."""

import gzip
import json
import os

import pytest

from cross_modal_video_engine_tpu.utils.trace_mine import (
    device_op_table, find_trace_file, format_table)


@pytest.fixture()
def trace_dir(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    ev = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},
        # wrapper op contains the others — excluded from pct
        {"ph": "X", "pid": 3, "tid": 1, "name": "while",
         "ts": 0, "dur": 10_000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fused_mlp_sublayer.1",
         "ts": 0, "dur": 6_000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fused_mlp_sublayer.2",
         "ts": 6_000, "dur": 2_000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.42",
         "ts": 8_000, "dur": 2_000},
        # host event on a different pid must be ignored
        {"ph": "X", "pid": 7, "tid": 1, "name": "hostwork",
         "ts": 0, "dur": 99_000},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": ev}, f)
    return str(tmp_path)


def test_find_trace_file(trace_dir):
    assert find_trace_file(trace_dir).endswith("vm.trace.json.gz")
    with pytest.raises(FileNotFoundError):
        find_trace_file(os.path.join(trace_dir, "nope"))


def test_device_op_table(trace_dir):
    rows = device_op_table(trace_dir, steps=2)
    byname = {r["name"]: r for r in rows}
    # numeric suffixes folded; host lane ignored
    assert "hostwork" not in byname
    mlp = byname["fused_mlp_sublayer"]
    assert mlp["ms"] == 8.0 and mlp["count"] == 2
    assert mlp["ms_per_step"] == 4.0
    # pct excludes the wrapper: 8 of (8 + 2) inner ms
    assert mlp["pct"] == 80.0
    assert byname["while"]["pct"] is None
    # descending by total time
    assert rows[0]["name"] == "while"
    assert rows[1]["name"] == "fused_mlp_sublayer"


def test_format_table(trace_dir):
    txt = format_table(device_op_table(trace_dir), top=3)
    assert "fused_mlp_sublayer" in txt and "wrap" in txt
