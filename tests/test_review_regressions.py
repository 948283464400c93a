"""Regression tests for self-review findings that had no dedicated
coverage: config merge purity, checkpoint-manager edge cases, service
error codes, BPE header handling, batcher latency bound."""

import json
import time
import urllib.request

import numpy as np

from cross_modal_video_engine_tpu.config import Config, _deep_merge


def test_deep_merge_does_not_mutate_override_dict():
    """merge must not pop _delete_ out of the CALLER's dict: the same
    options applied to a second config would silently deep-merge
    instead of replacing."""
    opts = {"model": {"backbone": {"_delete_": True, "type": "B"}}}
    base1 = {"model": {"backbone": {"type": "A", "depth": 50}}}
    base2 = {"model": {"backbone": {"type": "A", "depth": 50}}}
    _deep_merge(base1, opts)
    _deep_merge(base2, opts)
    assert base1["model"]["backbone"] == {"type": "B"}
    assert base2["model"]["backbone"] == {"type": "B"}   # not depth=50!
    assert opts["model"]["backbone"]["_delete_"] is True  # caller intact


def test_deep_merge_strips_nested_delete_on_new_keys():
    """_delete_ inside a dict whose parent key is ABSENT from the base
    must not leak into the merged tree (it would reach a model ctor as
    a bogus kwarg)."""
    base = {}
    _deep_merge(base, {"neck": {"_delete_": True, "type": "TPN"}})
    assert base["neck"] == {"type": "TPN"}


def test_best_checkpoint_manager_same_score_string(tmp_path):
    """A new best whose score formats to the same 4-decimal directory
    name must not delete the just-saved checkpoint."""
    import os

    from cross_modal_video_engine_tpu.train.checkpoint import (
        best_checkpoint_manager, load_checkpoint)

    save_best = best_checkpoint_manager(str(tmp_path))
    v1 = {"params": {"w": np.ones(3, np.float32)}}
    v2 = {"params": {"w": np.full(3, 2.0, np.float32)}}
    assert save_best(v1, None, 215.43211, {})
    assert save_best(v2, None, 215.43214, {})   # same "215.4321" name
    link = os.path.join(str(tmp_path), "model_best")
    assert os.path.exists(link)
    restored, _, _ = load_checkpoint(link, v1)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.0)


def test_service_missing_field_is_400_not_404():
    """A KeyError raised INSIDE a handler (missing payload field) must
    not masquerade as an unknown-route 404."""
    from cross_modal_video_engine_tpu.service.app import (EngineService,
                                                          serve_in_thread)

    svc = EngineService()
    svc.register("echo", lambda payload: {"got": payload["query"]})
    server, _t = serve_in_thread(svc, port=0)
    port = server.server_address[1]
    try:
        def post(route, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/{route}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        assert post("echo", {"query": "hi"}) == 200
        assert post("echo", {}) == 400          # missing field
        assert post("nope", {}) == 404          # unknown route
    finally:
        server.shutdown()


def test_bpe_version_header_without_hash_prefix(tmp_path):
    """The real CLIP merges file's first line is
    '\"...#version: 0.2' (NOT '#'-prefixed) — it must be dropped, not
    kept as the rank-0 merge."""
    from cross_modal_video_engine_tpu.utils.bpe import BPETokenizer

    p = tmp_path / "merges.txt"
    p.write_text('"bpe_simple_vocab_16e6.txt#version: 0.2\n'
                 "h e\nhe l\nl o</w>\n")
    tok = BPETokenizer(str(p))
    header_pair = ('"bpe_simple_vocab_16e6.txt#version:', "0.2")
    assert header_pair not in tok.bpe_ranks
    assert ("h", "e") in tok.bpe_ranks
    assert tok.bpe_ranks[("h", "e")] == 0


def test_micro_batcher_deadline_is_from_first_request():
    """A trickle of stragglers must not extend collection past one
    max_wait window (the old per-straggler timeout stretched it to
    max_batch * max_wait)."""
    from cross_modal_video_engine_tpu.service.batching import MicroBatcher

    waves = []
    b = MicroBatcher(lambda rows: [waves.append(len(rows)) or r
                                   for r in rows],
                     max_batch=64, max_wait_ms=80.0)
    try:
        import threading
        futs = []

        def trickle():
            for i in range(8):
                futs.append(b.submit_async(i))
                time.sleep(0.05)        # just under the 80ms window

        t0 = time.monotonic()
        th = threading.Thread(target=trickle)
        th.start()
        th.join()
        for f in futs:
            f.result(timeout=5)
        elapsed = time.monotonic() - t0
        # 8 stragglers at 50ms spacing = 400ms of submissions; with the
        # per-straggler timeout the FIRST wave alone could stretch to
        # 64*80ms; with the fixed deadline the first wave closes within
        # ~max_wait of its first row, so multiple waves form
        assert len(waves) >= 2, waves
        assert elapsed < 3.0
    finally:
        b.close()
