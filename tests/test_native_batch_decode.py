"""Threaded native batch decode (one ctypes call per training batch)."""

import numpy as np
import pytest

from cross_modal_video_engine_tpu.io import native
from cross_modal_video_engine_tpu.io.native import (NativeVideoReader,
                                                    decode_videos_batch,
                                                    native_available)
from cross_modal_video_engine_tpu.io.video_decode import write_test_video

rng = np.random.default_rng(313)


def _videos(tmp_path, n=4, T=20):
    paths = []
    for i in range(n):
        frames = rng.integers(0, 255, (T, 36, 44, 3)).astype(np.uint8)
        p = str(tmp_path / f"v{i}.mp4")
        write_test_video(p, frames)
        paths.append(p)
    return paths


def test_batch_decode_matches_per_video(tmp_path):
    if not native_available()["decode"]:
        pytest.skip("native decoder not built")
    paths = _videos(tmp_path)
    idx = np.stack([np.arange(0, 16, 2)] * 4)
    batch = decode_videos_batch(paths, idx, out_w=32, out_h=24, n_threads=3)
    assert batch.shape == (4, 8, 24, 32, 3)
    for i, p in enumerate(paths):
        r = NativeVideoReader(p)
        want = r.get_batch(list(idx[i]), out_size=(32, 24))
        r.release()
        np.testing.assert_array_equal(batch[i], want)


def test_batch_decode_failed_video_zeroed(tmp_path):
    if not native_available()["decode"]:
        pytest.skip("native decoder not built")
    paths = _videos(tmp_path, n=2)
    paths[1] = str(tmp_path / "missing.mp4")
    idx = np.zeros((2, 4), np.int64)
    batch = decode_videos_batch(paths, idx, out_w=16, out_h=16)
    assert batch[0].max() > 0
    assert batch[1].max() == 0


def test_batch_decode_fallback(tmp_path, monkeypatch):
    paths = _videos(tmp_path, n=2)
    monkeypatch.setattr(native, "_VD", None)
    idx = np.stack([np.arange(4)] * 2)
    batch = decode_videos_batch(paths, idx, out_w=20, out_h=20)
    assert batch.shape == (2, 4, 20, 20, 3)
    assert batch.max() > 0
