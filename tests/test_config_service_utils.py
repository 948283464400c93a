"""Config system, logging utils, profiling, HTTP service tests."""

import json
import time
import urllib.request

import numpy as np
import pytest

from cross_modal_video_engine_tpu.config import Config
from cross_modal_video_engine_tpu.utils.logging import (
    AverageMeter, LogCollector, Progbar)
from cross_modal_video_engine_tpu.utils.profiling import StageTimer, device_time
from cross_modal_video_engine_tpu.service.app import (
    EngineService, serve_in_thread)


def test_config_fromfile_with_base(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(depth=50, name='resnet')\nlr = 0.1\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = 'base.py'\nmodel = dict(depth=101)\nepochs = 3\n")
    cfg = Config.fromfile(str(child))
    assert cfg["model.depth"] == 101          # child overrides
    assert cfg["model.name"] == "resnet"      # base preserved
    assert cfg["lr"] == 0.1 and cfg["epochs"] == 3


def test_config_options_and_dataclass():
    from cross_modal_video_engine_tpu.models.dual_encoding import (
        DualEncodingConfig)
    cfg = Config({"model": {"visual_feat_dim": 128, "common_dim": 64,
                            "visual_kernel_sizes": [2, 3],
                            "not_a_field": 1}})
    cfg.merge_from_options(["model.common_dim=32", "model.gru_pool='max'"])
    dc = cfg.to_dataclass(DualEncodingConfig, "model")
    assert dc.common_dim == 32
    assert dc.visual_feat_dim == 128
    assert dc.gru_pool == "max"
    assert dc.visual_kernel_sizes == (2, 3)   # list -> tuple


def test_config_json_roundtrip(tmp_path):
    cfg = Config({"a": {"b": 1}})
    p = str(tmp_path / "c.json")
    cfg.dump(p)
    cfg2 = Config.fromfile(p)
    assert cfg2["a.b"] == 1


def test_meters_and_progbar(capsys):
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    scalars = []
    lc = LogCollector(sink=lambda k, v, s: scalars.append((k, v, s)))
    lc.update("loss", 0.5)
    lc.tb_log(7)
    assert scalars == [("loss", 0.5, 7)]
    pb = Progbar(4)
    pb.add(2, {"loss": 0.1})
    pb.add(2)
    out = capsys.readouterr().out
    assert "4/4" in out


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    rep = t.report()
    assert rep["a"]["count"] == 1 and rep["a"]["total_s"] >= 0.01


def test_device_time_runs():
    import jax.numpy as jnp
    dt = device_time(lambda x: x * 2.0, jnp.ones((8, 8)), steps=3)
    assert dt > 0


def test_http_service():
    svc = EngineService()
    svc.register("retrieval", lambda p: {"results": [f"vid{p['topK']}"]})
    server, _ = serve_in_thread(svc, port=0)
    port = server.server_address[1]
    try:
        # health
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health") as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and "retrieval" in h["routes"]
        # dispatch
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieval",
            data=json.dumps({"topK": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["results"] == ["vid3"]
        # unknown route -> 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/nope", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 404
        # handler error -> 500
        svc.register("boom", lambda p: 1 / 0)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/boom", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 500
    finally:
        server.shutdown()


def test_pow2_rows_padding_rules():
    """Wave padding: pow2 sizes only (bounded compile count), row-0
    repeats, n_real preserved; the retrieval route's min_batch=8 floor
    avoids the pathological M=1 index GEMV (bench_serve r5)."""
    from cross_modal_video_engine_tpu.cli.serve import _pow2_rows

    rows, n = _pow2_rows(["a"], 32)
    assert (rows, n) == (["a"], 1)            # model routes: no floor
    rows, n = _pow2_rows(["a"], 32, min_batch=8)
    assert rows == ["a"] * 8 and n == 1       # retrieval: 8-row floor
    rows, n = _pow2_rows(list("abc"), 32, min_batch=8)
    assert len(rows) == 8 and rows[:3] == list("abc") and n == 3
    rows, n = _pow2_rows(list("abcdefghij"), 32, min_batch=8)
    assert len(rows) == 16 and n == 10        # pow2 above the floor
    rows, n = _pow2_rows(list(range(40)), 32, min_batch=8)
    assert len(rows) == 40 and n == 40        # overflow wave: as-is
