"""Native C++ IO layer tests (parity vs Python fallbacks)."""

import numpy as np
import pytest

from cross_modal_video_engine_tpu.io.native import (
    NativeBigFile, NativeVideoReader, native_available)
from cross_modal_video_engine_tpu.io.bigfile import write_bigfile
from cross_modal_video_engine_tpu.io.video_decode import (
    CvVideoReader, write_test_video)

rng = np.random.default_rng(101)


def test_native_libs_built():
    avail = native_available()
    assert avail["bigfile"], "libcmve_bigfile.so missing — run make -C native"
    assert avail["decode"], "libcmve_decode.so missing — run make -C native"


def test_native_bigfile_parity(tmp_path):
    names = [f"v{i}" for i in range(50)]
    mat = rng.standard_normal((50, 32)).astype(np.float32)
    d = str(tmp_path / "bf")
    write_bigfile(d, names, mat)
    bf = NativeBigFile(d)
    assert bf.is_native
    sel = ["v7", "v3", "v49", "v7"]
    np.testing.assert_array_equal(bf.read_batch(sel),
                                  mat[[7, 3, 49, 7]])
    np.testing.assert_array_equal(bf.read_one("v0"), mat[0])
    # big threaded gather
    rows = rng.integers(0, 50, 500)
    np.testing.assert_array_equal(bf.gather_rows(rows), mat[rows])
    bf.close()


def test_native_decode_matches_cv2(tmp_path):
    frames = rng.integers(0, 255, (25, 48, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "v.mp4")
    write_test_video(path, frames)

    nv = NativeVideoReader(path)
    assert nv.is_native
    assert nv.width == 64 and nv.height == 48
    idx = [0, 5, 10, 24, 5]
    got = nv.get_batch(idx)
    assert got.shape == (5, 48, 64, 3)

    cv = CvVideoReader(path)
    want = cv.get_batch(idx)
    # same codec output, decoded by two different stacks: should be very close
    diff = np.abs(got.astype(int) - want.astype(int)).mean()
    assert diff < 2.0, f"decoders disagree, mean abs diff {diff}"
    # repeated index rows identical
    np.testing.assert_array_equal(got[1], got[4])
    nv.release()


def test_native_decode_fused_resize(tmp_path):
    frames = rng.integers(0, 255, (10, 40, 60, 3), dtype=np.uint8)
    path = str(tmp_path / "v2.mp4")
    write_test_video(path, frames)
    nv = NativeVideoReader(path)
    out = nv.get_batch([0, 3], out_size=(32, 24))
    assert out.shape == (2, 24, 32, 3)
    nv.release()


def test_native_decode_out_of_range_repeats_last(tmp_path):
    frames = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    path = str(tmp_path / "v3.mp4")
    write_test_video(path, frames)
    nv = NativeVideoReader(path)
    out = nv.get_batch([6, 7, 50])
    np.testing.assert_array_equal(out[2], out[1])
    nv.release()


def test_native_decode_late_clip_seek(tmp_path):
    """First wanted index > 64 triggers the keyframe-seek fast path;
    pts-recovered frame numbering must still return the right frames."""
    frames = np.zeros((120, 48, 64, 3), np.uint8)
    # encode the frame number in a big solid block so codec noise
    # cannot blur the identity check
    for i in range(120):
        frames[i, :, :, 0] = (i * 2) % 256
    path = str(tmp_path / "long.mp4")
    write_test_video(path, frames)

    nv = NativeVideoReader(path)
    assert nv.is_native
    idx = [100, 110, 119]
    got = nv.get_batch(idx)
    cv = CvVideoReader(path)
    want = cv.get_batch(idx)
    diff = np.abs(got.astype(int) - want.astype(int)).mean()
    assert diff < 2.0, f"late-seek decode disagrees, mean abs diff {diff}"
    nv.release()
    cv.release()

def test_native_sparse_gop_skip_bit_identical(tmp_path):
    """Sparse sampling takes the GOP-skipping re-seek path
    (native/decode.cc maybe_skip); frames must be bit-identical to the
    dense sequential scan, for sorted, unsorted and repeated indices."""
    frames = rng.integers(0, 255, (300, 72, 88, 3), dtype=np.uint8)
    path = str(tmp_path / "gop.mp4")
    write_test_video(path, frames)

    nv = NativeVideoReader(path)
    assert nv.is_native
    dense = nv.get_batch(list(range(300)))
    nv.release()

    for idx in (
        np.linspace(0, 299, 8).astype(int).tolist(),   # uniform sparse
        [250, 10, 170, 10, 299, 0],                    # unsorted + repeat
        list(range(100, 140)),                         # dense mid-clip
        [290, 295, 299],                               # tail only
    ):
        nv = NativeVideoReader(path)
        got = nv.get_batch(idx)
        nv.release()
        for j, i in enumerate(idx):
            np.testing.assert_array_equal(got[j], dense[i])


def test_native_decode_no_buffer_overrun(tmp_path):
    """swscale SIMD overran the tight caller buffer by 24 bytes before the
    staging-copy fix (heap corruption); canary-pad the buffer and decode
    with an unaligned stride (88*3=264) to pin the fix."""
    import ctypes

    from cross_modal_video_engine_tpu.io import native as nat

    frames = rng.integers(0, 255, (60, 72, 88, 3), dtype=np.uint8)
    path = str(tmp_path / "canary.mp4")
    write_test_video(path, frames)

    info = np.zeros(3, np.int32)
    h = nat._VD.vd_open(path.encode(), info.ctypes.data)
    assert h
    w, ht = int(info[1]), int(info[2])
    idx = np.ascontiguousarray([0, 30, 59, 10], np.int64)
    nbytes = len(idx) * ht * w * 3
    pad = 4096
    buf = np.full(nbytes + pad, 0xAB, np.uint8)
    rc = nat._VD.vd_decode(h, idx.ctypes.data, len(idx),
                           buf.ctypes.data, w, ht)
    nat._VD.vd_close(h)
    assert rc == 0
    assert (buf[nbytes:] == 0xAB).all(), "decoder wrote past the out buffer"
