"""ctypes bindings for the native (C++) IO layer.

Builds live in `io/_native/` (see native/Makefile).  Every binding has a
pure-Python fallback so the framework works without the compiled libs:

  * NativeBigFile  -> io.bigfile.BigFile (numpy memmap)
  * NativeVideoReader -> io.video_decode.CvVideoReader (cv2)
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "_native")


def _load(name: str) -> Optional[ctypes.CDLL]:
    path = os.path.join(_DIR, name)
    if not os.path.exists(path):
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


_BF = _load("libcmve_bigfile.so")
if _BF is not None:
    _BF.bf_open.restype = ctypes.c_void_p
    _BF.bf_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
    _BF.bf_gather.restype = ctypes.c_int
    _BF.bf_gather.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
    _BF.bf_close.argtypes = [ctypes.c_void_p]

_VD = _load("libcmve_decode.so")
if _VD is not None:
    _VD.vd_open.restype = ctypes.c_void_p
    _VD.vd_open.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    _VD.vd_decode.restype = ctypes.c_int
    _VD.vd_decode.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_int64, ctypes.c_void_p,
                              ctypes.c_int, ctypes.c_int]
    _VD.vd_close.argtypes = [ctypes.c_void_p]
    if hasattr(_VD, "ad_extract"):
        _VD.ad_duration.restype = ctypes.c_double
        _VD.ad_duration.argtypes = [ctypes.c_char_p]
        _VD.ad_extract.restype = ctypes.c_int64
        _VD.ad_extract.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_void_p, ctypes.c_int64]
    if hasattr(_VD, "vd_decode_batch"):
        _VD.vd_decode_batch.restype = ctypes.c_int
        _VD.vd_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]


def native_available() -> dict:
    return {"bigfile": _BF is not None, "decode": _VD is not None}


class NativeBigFile:
    """Drop-in for io.bigfile.BigFile backed by the C++ mmap gather."""

    def __init__(self, datadir: str, n_threads: int = 4):
        with open(os.path.join(datadir, "shape.txt")) as f:
            self.nr_of_images, self.ndims = map(int, f.readline().split())
        with open(os.path.join(datadir, "id.txt")) as f:
            self.names = f.read().split()
        self.name2index = {n: i for i, n in enumerate(self.names)}
        self.n_threads = n_threads
        self._handle = None
        if _BF is not None:
            self._handle = _BF.bf_open(
                os.path.join(datadir, "feature.bin").encode(),
                self.nr_of_images, self.ndims)
        if not self._handle:
            from .bigfile import BigFile
            self._fallback = BigFile(datadir)
        else:
            self._fallback = None

    @property
    def is_native(self) -> bool:
        return self._fallback is None

    def read_batch(self, requested: Sequence[str]) -> np.ndarray:
        if self._fallback is not None:
            return self._fallback.read_batch(requested)
        rows = np.asarray([self.name2index[n] for n in requested], np.int64)
        return self.gather_rows(rows)

    def gather_rows(self, rows: np.ndarray) -> np.ndarray:
        rows = np.ascontiguousarray(rows, np.int64)
        out = np.empty((len(rows), self.ndims), np.float32)
        rc = _BF.bf_gather(self._handle, rows.ctypes.data, len(rows),
                           out.ctypes.data, self.n_threads)
        if rc != 0:
            raise RuntimeError(f"bf_gather failed rc={rc}")
        return out

    def read_one(self, name: str) -> np.ndarray:
        return self.read_batch([name])[0]

    def shape(self):
        return (self.nr_of_images, self.ndims)

    def __contains__(self, name: str) -> bool:
        return name in self.name2index

    def close(self):
        if self._handle:
            _BF.bf_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeVideoReader:
    """Drop-in for io.video_decode.CvVideoReader backed by libav."""

    def __init__(self, path: str):
        self.path = path
        self._handle = None
        self._fallback = None
        if _VD is not None:
            info = np.zeros(3, np.int32)
            self._handle = _VD.vd_open(path.encode(), info.ctypes.data)
            if self._handle:
                self._n, self.width, self.height = (int(info[0]),
                                                    int(info[1]),
                                                    int(info[2]))
        if self._handle:
            # the native info array has no fps; probe it with cv2 so
            # the CvVideoReader interface contract (DecordInit reads
            # .fps) holds on both paths
            try:
                import cv2
                cap = cv2.VideoCapture(path)
                self.fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                cap.release()
            except Exception:
                self.fps = 30.0
        else:
            from .video_decode import CvVideoReader
            self._fallback = CvVideoReader(path)
            self._n = len(self._fallback)
            self.width = self._fallback.width
            self.height = self._fallback.height
            self.fps = self._fallback.fps

    @property
    def is_native(self) -> bool:
        return self._fallback is None

    def __len__(self) -> int:
        return self._n

    def get_batch(self, indices: Sequence[int],
                  out_size: Optional[tuple] = None) -> np.ndarray:
        """Decode frames; optionally fused resize to out_size=(w, h)."""
        if self._fallback is not None:
            frames = self._fallback.get_batch(indices)
            if out_size and (out_size[0] != self.width
                             or out_size[1] != self.height):
                # honor out_size on the fallback path too — behavior
                # must not depend on whether the native lib is built
                import cv2
                frames = np.stack([cv2.resize(f, tuple(out_size))
                                   for f in frames])
            return frames
        idx = np.ascontiguousarray(indices, np.int64)
        w = out_size[0] if out_size else self.width
        h = out_size[1] if out_size else self.height
        out = np.empty((len(idx), h, w, 3), np.uint8)
        rc = _VD.vd_decode(self._handle, idx.ctypes.data, len(idx),
                           out.ctypes.data, w, h)
        if rc != 0:
            raise IOError(f"vd_decode failed rc={rc} for {self.path}")
        return out

    def release(self):
        if self._handle:
            _VD.vd_close(self._handle)
            self._handle = None
        if self._fallback is not None:
            self._fallback.release()

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass


def read_audio(path: str, sample_rate: int = 16000
               ) -> Optional[np.ndarray]:
    """Decode a container's audio stream to mono float32 at `sample_rate`
    (in-process replacement for the reference's `ffmpeg -map 0:a` shell
    call, MCT/tools/data/extract_audio.py:21).  Returns None when the
    native lib is unavailable or the file has no audio stream."""
    if _VD is None or not hasattr(_VD, "ad_extract"):
        return None
    secs = _VD.ad_duration(os.fsencode(path))
    if secs <= 0:
        secs = 600.0  # unknown duration: cap at 10 minutes
    max_samples = int(secs * sample_rate) + sample_rate
    out = np.empty((max_samples,), np.float32)
    n = _VD.ad_extract(os.fsencode(path), sample_rate,
                       out.ctypes.data_as(ctypes.c_void_p), max_samples)
    if n < 0:
        return None
    return out[:n].copy()


def decode_videos_batch(paths: Sequence[str], indices: np.ndarray,
                        out_w: int, out_h: int,
                        n_threads: int = 8) -> np.ndarray:
    """Decode a BATCH of videos into one (B, T, out_h, out_w, 3) uint8
    array — resize happens inside the decoder (swscale), and the whole
    batch is one ctypes call driving a C++ thread pool (the loader hot
    path that keeps the TPU fed; the reference decodes per video from
    Python workers).

    indices: (B, T) int64 frame indices per video.  Falls back to the
    per-video reader (native or cv2) when the compiled lib is absent.
    Failed videos come back as zeros (matching vd_decode_batch).
    """
    indices = np.ascontiguousarray(np.asarray(indices, np.int64))
    B, T = indices.shape
    assert len(paths) == B
    out = np.empty((B, T, out_h, out_w, 3), np.uint8)
    if _VD is not None and hasattr(_VD, "vd_decode_batch"):
        c_paths = (ctypes.c_char_p * B)(
            *[os.fsencode(p) for p in paths])
        _VD.vd_decode_batch(
            c_paths, indices.ctypes.data_as(ctypes.c_void_p), T, B,
            out.ctypes.data_as(ctypes.c_void_p), out_w, out_h, n_threads)
        return out
    # fallback: per-video decode + host resize
    from .video_decode import open_video
    for i, p in enumerate(paths):
        try:
            reader = open_video(p)
            frames = reader.get_batch(list(indices[i]))
            reader.release()
            if frames.shape[1:3] != (out_h, out_w):
                import cv2
                frames = np.stack([
                    cv2.resize(f, (out_w, out_h),
                               interpolation=cv2.INTER_LINEAR)
                    for f in frames])
            out[i] = frames
        except Exception:
            out[i] = 0
    return out
