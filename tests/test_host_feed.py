"""DecodePrefetcher: ordered, overlapped host decode feeding the device
(the reference DataLoader num_workers/prefetch_factor role)."""

import numpy as np
import pytest

from cross_modal_video_engine_tpu.io.pipeline import (DecodePrefetcher,
                                                      uniform_indices)
from cross_modal_video_engine_tpu.io.video_decode import write_test_video


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("vids")
    paths = []
    for i in range(7):
        # distinct DC level per video so content identifies order
        frames = np.full((10, 32, 48, 3), 20 + i * 30, np.uint8)
        p = str(d / f"v{i}.mp4")
        write_test_video(p, frames)
        paths.append(p)
    return paths


def test_prefetcher_ordered_and_complete(videos):
    idx = uniform_indices(len(videos), 10, 4)
    pf = DecodePrefetcher(videos, idx, out_hw=(16, 24), batch_size=3,
                          n_workers=2, depth=2)
    assert len(pf) == 3            # 3 + 3 + 1
    got = list(pf)
    sizes = [b.shape for b, _ in got]
    assert sizes == [(3, 4, 16, 24, 3), (3, 4, 16, 24, 3),
                     (1, 4, 16, 24, 3)]
    # order preserved: mean brightness is monotonic in video id
    means = [float(b[j].mean()) for b, _ in got for j in range(b.shape[0])]
    assert all(m2 > m1 for m1, m2 in zip(means, means[1:]))
    # paths ride along for bookkeeping
    assert [p for _, ps in got for p in ps] == videos


def test_prefetcher_matches_direct_decode(videos):
    from cross_modal_video_engine_tpu.io.native import decode_videos_batch
    idx = uniform_indices(len(videos), 10, 4)
    direct = decode_videos_batch(videos, idx, out_w=24, out_h=16)
    pf = DecodePrefetcher(videos, idx, out_hw=(16, 24),
                          batch_size=len(videos), n_workers=1)
    (batch, _), = list(pf)
    np.testing.assert_array_equal(batch, direct)


def test_prefetcher_single_worker_and_empty(videos):
    idx = uniform_indices(len(videos), 10, 2)
    pf = DecodePrefetcher(videos, idx, out_hw=(16, 16), batch_size=4,
                          n_workers=1, depth=1)
    assert sum(b.shape[0] for b, _ in pf) == len(videos)
    empty = DecodePrefetcher([], np.zeros((0, 2)), out_hw=(16, 16),
                             batch_size=4)
    assert list(empty) == []


def test_prefetcher_early_exit_reaps_workers(videos):
    """Abandoning the iterator mid-stream must not leak worker threads
    (long-lived consumers break out of epochs / raise in device steps)."""
    import threading
    before = threading.active_count()
    idx = uniform_indices(len(videos), 10, 2)
    pf = DecodePrefetcher(videos, idx, out_hw=(16, 16), batch_size=2,
                          n_workers=2, depth=1)
    it = iter(pf)
    next(it)
    it.close()          # generator finally runs: stop + release + join
    assert threading.active_count() <= before


def test_prefetcher_decode_error_surfaces(tmp_path, videos):
    bad = str(tmp_path / "missing.mp4")
    idx = uniform_indices(2, 10, 2)
    pf = DecodePrefetcher([videos[0], bad], idx, out_hw=(16, 16),
                          batch_size=2)
    # decode_videos_batch zero-fills failures rather than raising —
    # the pipeline must deliver that contract, not hang
    out = [b for b, _ in pf]
    assert out[0].shape == (2, 2, 16, 16, 3)
    assert out[0][1].max() == 0 and out[0][0].max() > 0
