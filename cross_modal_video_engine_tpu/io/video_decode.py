"""Video decode layer.

Replaces decord/PyAV/OpenCV decode in the reference
(MultiFusion/src/utils.py:15-29; MCT loading.py:725-1247) with one host
decode service.  Backend: OpenCV's bundled FFmpeg (`cv2.VideoCapture`)
via `CvVideoReader`; the C++ libav path (io/native) plugs in behind the
same interface when built.

Decoded frames are returned RGB uint8 (decord convention — the reference
pipelines assume RGB from DecordDecode).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np


class CvVideoReader:
    """decord.VideoReader-alike over cv2.VideoCapture."""

    def __init__(self, path: str):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self.path = path
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise IOError(f"cannot open video {path}")
        self._n = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = self._cap.get(cv2.CAP_PROP_FPS)
        self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self._pos = 0

    def __len__(self) -> int:
        return self._n

    def _read_at(self, idx: int) -> np.ndarray:
        if idx != self._pos:
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok, frame = self._cap.read()
        if not ok:
            # fall back: re-open and seek (some containers mis-seek)
            self._cap.release()
            self._cap = cv2.VideoCapture(self.path)
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
            ok, frame = self._cap.read()
            if not ok:
                raise IOError(f"decode failed at frame {idx} of {self.path}")
        self._pos = idx + 1
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        """Sorted-unique decode then gather, like decord get_batch."""
        indices = np.asarray(indices, np.int64)
        uniq = np.unique(indices)
        cache = {int(i): self._read_at(int(i)) for i in uniq}
        return np.stack([cache[int(i)] for i in indices])

    def release(self):
        self._cap.release()


def open_video(path: str) -> CvVideoReader:
    return CvVideoReader(path)


# -- pipeline ops ------------------------------------------------------------
from ..utils.registry import PIPELINES  # noqa: E402


@PIPELINES.register("DecordInit")
class DecordInit:
    """loading.py:1027: attach a reader + total_frames to results."""

    def __call__(self, results: Dict) -> Dict:
        reader = open_video(results["filename"])
        results["video_reader"] = reader
        results["total_frames"] = len(reader)
        results.setdefault("start_index", 0)
        results["avg_fps"] = reader.fps
        return results


@PIPELINES.register("DecordDecode")
class DecordDecode:
    """loading.py:1081: decode results['frame_inds'] into results['imgs']."""

    def __call__(self, results: Dict) -> Dict:
        reader = results["video_reader"]
        frames = reader.get_batch(results["frame_inds"])
        results["imgs"] = list(frames)
        results["original_shape"] = frames.shape[1:3]
        results["img_shape"] = frames.shape[1:3]
        reader.release()
        results["video_reader"] = None
        return results


@PIPELINES.register("OpenCVInit")
class OpenCVInit(DecordInit):
    pass


@PIPELINES.register("OpenCVDecode")
class OpenCVDecode(DecordDecode):
    pass


@PIPELINES.register("RawFrameDecode")
class RawFrameDecode:
    """loading.py:1249: read img_{idx:05d}.jpg frames from frame_dir.
    frame_inds index the template directly — RawframeDataset defaults
    start_index=1 (the mmaction 1-based rawframe convention), so an
    extra +1 here would double-offset every ported config."""

    def __call__(self, results: Dict) -> Dict:
        tmpl = results.get("filename_tmpl", "img_{:05d}.jpg")
        d = results["frame_dir"]
        imgs = []
        for idx in results["frame_inds"]:
            p = os.path.join(d, tmpl.format(int(idx)))
            img = cv2.imread(p)
            if img is None:
                raise IOError(f"missing frame {p}")
            imgs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        results["imgs"] = imgs
        results["original_shape"] = imgs[0].shape[:2]
        results["img_shape"] = imgs[0].shape[:2]
        return results


def write_test_video(path: str, frames: np.ndarray, fps: int = 10) -> None:
    """Write an RGB uint8 (T, H, W, 3) array as an mp4 (test fixture)."""
    t, h, w, _ = frames.shape
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
    assert writer.isOpened(), f"cannot open writer for {path}"
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
