"""Pipeline-op tail: audio, skeleton/pose, localization-feature and the
remaining geometric ops.

Completes the mmaction pipeline registry surface beyond data/pipelines.py:

  audio    — AudioDecodeInit / LoadAudioFeature / AudioDecode /
             AudioFeatureSelector / AudioAmplify / MelSpectrogram /
             FormatAudioShape
             (reference MCT/mmaction/datasets/pipelines/loading.py:1443-1697,
             augmentations.py:1851-1958, formatting.py:340-377)
  pose     — UniformSampleFrames / PaddingWithLoop / PoseDecode /
             LoadKineticsPose / PoseNormalize / PoseCompact / JointToBone /
             FormatGCNInput / GeneratePoseTarget
             (pose_loading.py:14-720, augmentations.py:169-260,
             formatting.py:378-500)
  localize — LoadLocalizationFeature / GenerateLocalizationLabels /
             LoadProposals / SampleProposalFrames
             (loading.py:470-725, 1697-1860)
  misc     — RandomCrop / RandomRescale / BuildPseudoClip / SampleAVAFrames
             (augmentations.py:556-640, 1171-1220; loading.py:424-467)

All ops are host-side numpy over the same `results` dict contract as the
reference registry, so mmaction-style config lists translate 1:1 through
`build_pipeline`.  Deviations from the reference are noted per-op; the
device path (ResNetAudio's on-device log-mel front end in models/audio.py)
stays the production route — these ops exist for config parity and for
feeding precomputed/offline features.

Intentionally not ported (torch/runtime-specific, no JAX counterpart):
ToTensor / ToDataContainer / ImageToTensor (mmcv DataContainer batching —
our batches are plain numpy, formatting.py semantics are covered by
FormatShape/Collect/Transpose), the lazy-op Fuse pass (ops here are
eager; XLA does the on-device fusion), PIMSInit/PIMSDecode (pims is not
in this image; Decord/OpenCV/libav cover the same containers) and
PyAVDecodeMotionVector (compressed-domain motion vectors; no consumer
in the reference's configs beyond an example).
"""

from __future__ import annotations

import os
import pickle
import wave
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..utils.registry import PIPELINES
from .pipelines import CenterCrop, Resize  # noqa: F401 (Resize reused)

# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def resample_audio(y: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase windowed-sinc resampling (scipy.signal.resample_poly,
    Kaiser-windowed FIR) — the band-limited resampler class librosa's
    loader uses, replacing the earlier linear interpolation which
    aliased everything above the new Nyquist."""
    from fractions import Fraction

    from scipy.signal import resample_poly
    frac = Fraction(sr_out, sr_in).limit_denominator(1000)
    out = resample_poly(y.astype(np.float64), frac.numerator,
                        frac.denominator)
    n_target = int(round(len(y) * sr_out / sr_in))
    if len(out) < n_target:
        out = np.pad(out, (0, n_target - len(out)))
    return out[:n_target].astype(np.float32)


@PIPELINES.register("AudioDecodeInit")
class AudioDecodeInit:
    """loading.py:1443-1511.  The reference decodes via librosa (resample to
    `sample_rate`, mono, float -1..1); librosa is not in this image, so we
    read PCM WAV with the stdlib and linearly resample.  Missing files get
    the same 10 s zero/random dummy as the reference."""

    def __init__(self, sample_rate: int = 16000, pad_method: str = "zero",
                 seed: Optional[int] = None):
        assert pad_method in ("zero", "random")
        self.sample_rate = sample_rate
        self.pad_method = pad_method
        self.rng = np.random.default_rng(seed)

    def _dummy(self) -> np.ndarray:
        n = int(round(10.0 * self.sample_rate))
        if self.pad_method == "zero":
            return np.zeros((n,), np.float32)
        return (self.rng.random(n).astype(np.float32) * 2 - 1)

    def _read_wav(self, path: str) -> np.ndarray:
        with wave.open(path, "rb") as f:
            sr = f.getframerate()
            n_ch = f.getnchannels()
            width = f.getsampwidth()
            raw = f.readframes(f.getnframes())
        if width == 3:
            # 24-bit PCM: widen each little-endian 3-byte sample to
            # int32 (sign byte replicated) then scale by 2^23
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            y = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
                 ).astype(np.float32) / float(2 ** 23 - 1)
        else:
            dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
            y = np.frombuffer(raw, dtype=dtype).astype(np.float32)
            if width == 1:
                y = (y - 128.0) / 128.0
            else:
                y = y / float(np.iinfo(dtype).max)
        if n_ch > 1:
            y = y.reshape(-1, n_ch).mean(axis=1)
        if sr != self.sample_rate:
            y = resample_audio(y, sr, self.sample_rate)
        return y

    def __call__(self, results: Dict) -> Dict:
        path = results["audio_path"]
        y = None
        if os.path.exists(path):
            if path.endswith(".wav"):
                y = self._read_wav(path)
            else:
                # non-wav containers (mp4/mkv/...): native libav decode
                from ..io.native import read_audio
                y = read_audio(path, self.sample_rate)
        if y is None:
            y = self._dummy()
        results["length"] = y.shape[0]
        results["sample_rate"] = self.sample_rate
        results["audios"] = y
        return results


@PIPELINES.register("LoadAudioFeature")
class LoadAudioFeature:
    """loading.py:1515-1559: np.load offline spectrograms; (640, 80) dummy
    when the video has no audio stream."""

    def __init__(self, pad_method: str = "zero", seed: Optional[int] = None):
        assert pad_method in ("zero", "random")
        self.pad_method = pad_method
        self.rng = np.random.default_rng(seed)

    def __call__(self, results: Dict) -> Dict:
        path = results["audio_path"]
        if os.path.exists(path):
            feat = np.load(path)
        elif self.pad_method == "zero":
            feat = np.zeros((640, 80), np.float32)
        else:
            feat = self.rng.random((640, 80)).astype(np.float32)
        results["length"] = feat.shape[0]
        results["audios"] = feat
        return results


def _clip_bounds(clip_frame_inds: np.ndarray, total_frames: int,
                 length: int) -> Tuple[int, int]:
    """Shared frame-window -> sample-window mapping (loading.py:1588-1600)."""
    start = max(0, int(round((clip_frame_inds[0] + 1) / total_frames * length)))
    end = min(length, int(round((clip_frame_inds[-1] + 1)
                                / total_frames * length)))
    return start, end


@PIPELINES.register("AudioDecode")
class AudioDecode:
    """loading.py:1562-1608: crop the waveform to each sampled frame clip,
    truncate/zero-pad to fixed_length samples."""

    def __init__(self, fixed_length: int = 32000):
        self.fixed_length = fixed_length

    def __call__(self, results: Dict) -> Dict:
        audio = results["audios"]
        frame_inds = results["frame_inds"].reshape(results["num_clips"], -1)
        clips = []
        for inds in frame_inds:
            s, e = _clip_bounds(inds, results["total_frames"],
                                results["length"])
            crop = audio[s:e]
            if crop.shape[0] >= self.fixed_length:
                crop = crop[:self.fixed_length]
            else:
                crop = np.pad(crop, (0, self.fixed_length - crop.shape[0]))
            clips.append(crop)
        results["audios"] = np.array(clips)
        results["audios_shape"] = results["audios"].shape
        return results


@PIPELINES.register("AudioFeatureSelector")
class AudioFeatureSelector:
    """loading.py:1643-1697: same window crop over (T, F) features,
    truncate/zero-pad the time axis to fixed_length rows."""

    def __init__(self, fixed_length: int = 128):
        self.fixed_length = fixed_length

    def __call__(self, results: Dict) -> Dict:
        audio = results["audios"]
        frame_inds = results["frame_inds"].reshape(results["num_clips"], -1)
        clips = []
        for inds in frame_inds:
            s, e = _clip_bounds(inds, results["total_frames"],
                                results["length"])
            crop = audio[s:e, :]
            if crop.shape[0] >= self.fixed_length:
                crop = crop[:self.fixed_length, :]
            else:
                crop = np.pad(
                    crop, ((0, self.fixed_length - crop.shape[0]), (0, 0)))
            clips.append(crop)
        results["audios"] = np.array(clips)
        results["audios_shape"] = results["audios"].shape
        return results


@PIPELINES.register("AudioAmplify")
class AudioAmplify:
    """augmentations.py:1851-1884."""

    def __init__(self, ratio: float):
        self.ratio = float(ratio)

    def __call__(self, results: Dict) -> Dict:
        results["audios"] = results["audios"] * self.ratio
        results["amplify_ratio"] = self.ratio
        return results


@PIPELINES.register("MelSpectrogram")
class MelSpectrogram:
    """augmentations.py:1887-1958.  The reference shells out to
    librosa.feature.melspectrogram; we reproduce librosa's exact
    pipeline in numpy: centered STFT (reflect padding of n_fft//2),
    PERIODIC hann window, power-2 spectrum, Slaney-scale mel filterbank
    with 'slaney' area normalization (models/audio.py
    librosa_mel_filterbank) — so imported audio checkpoints see the
    training-time feature distribution, not a shifted one.
    Output is time-major (clips, fixed_length, n_mels) so it feeds
    FormatAudioShape exactly like AudioFeatureSelector's offline features —
    the reference's (n_mels, t) orientation + its transposed-pad call would
    crash for fixed_length != n_mels."""

    def __init__(self, window_size: int = 32, step_size: int = 16,
                 n_mels: int = 80, fixed_length: int = 128):
        self.window_size = window_size
        self.step_size = step_size
        self.n_mels = n_mels
        self.fixed_length = fixed_length

    def __call__(self, results: Dict) -> Dict:
        from ..models.audio import librosa_mel_filterbank, periodic_hann

        signals = np.atleast_2d(results["audios"])
        sr = results["sample_rate"]
        n_fft = int(round(sr * self.window_size / 1000))
        hop = int(round(sr * self.step_size / 1000))
        window = periodic_hann(n_fft)
        fb = librosa_mel_filterbank(self.n_mels, n_fft, sr)
        mels = []
        for clip in signals[:results.get("num_clips", signals.shape[0])]:
            # librosa center=True: reflect-pad n_fft//2 both sides, then
            # 1 + len//hop frames
            clip = np.pad(clip, n_fft // 2,
                          mode="reflect" if len(clip) > 1 else "constant")
            n_frames = max(1, 1 + (len(clip) - n_fft) // hop)
            if len(clip) < n_fft:
                clip = np.pad(clip, (0, n_fft - len(clip)))
            frames = np.lib.stride_tricks.sliding_window_view(
                clip, n_fft)[::hop][:n_frames]
            power = np.abs(np.fft.rfft(frames * window, axis=-1)) ** 2
            mel = power @ fb                          # (T, n_mels)
            if mel.shape[0] >= self.fixed_length:
                mel = mel[:self.fixed_length]
            else:
                mel = np.pad(mel, ((0, self.fixed_length - mel.shape[0]),
                                   (0, 0)), mode="edge")
            mels.append(mel.astype(np.float32))
        results["audios"] = np.array(mels)
        return results


@PIPELINES.register("FormatAudioShape")
class FormatAudioShape:
    """formatting.py:340-377: (clips, T, F) -> NCTF (clips, 1, T, F)."""

    def __init__(self, input_format: str = "NCTF"):
        assert input_format == "NCTF"

    def __call__(self, results: Dict) -> Dict:
        audios = results["audios"]
        clips, t, f = audios.shape
        results["audios"] = audios.reshape(clips, 1, t, f)
        results["input_shape"] = results["audios"].shape
        return results


# ---------------------------------------------------------------------------
# pose / skeleton
# ---------------------------------------------------------------------------


@PIPELINES.register("UniformSampleFrames")
class UniformSampleFrames:
    """pose_loading.py:14-139: split into clip_len segments, one frame per
    segment; special cases below/near clip_len follow the reference exactly.
    Test mode draws from a fixed seed for reproducibility."""

    def __init__(self, clip_len: int, num_clips: int = 1,
                 test_mode: bool = False, seed: int = 255):
        self.clip_len = clip_len
        self.num_clips = num_clips
        self.test_mode = test_mode
        self.seed = seed
        self.rng = np.random.default_rng(None if not test_mode else seed)

    def _sample_once(self, num_frames: int, rng) -> np.ndarray:
        clip_len = self.clip_len
        if num_frames < clip_len:
            start = rng.integers(0, num_frames)
            return np.arange(start, start + clip_len)
        if num_frames < 2 * clip_len:
            basic = np.arange(clip_len)
            inds = rng.choice(clip_len + 1, num_frames - clip_len,
                              replace=False)
            offset = np.zeros(clip_len + 1, dtype=np.int64)
            offset[inds] = 1
            return basic + np.cumsum(offset)[:-1]
        bids = np.array([i * num_frames // clip_len
                         for i in range(clip_len + 1)])
        bsize = np.diff(bids)
        return bids[:clip_len] + rng.integers(0, bsize)

    def __call__(self, results: Dict) -> Dict:
        num_frames = results["total_frames"]
        if self.test_mode:
            rng = np.random.default_rng(self.seed)
            if num_frames < self.clip_len and num_frames < self.num_clips:
                starts = list(range(self.num_clips))
                inds = np.concatenate(
                    [np.arange(i, i + self.clip_len) for i in starts])
            elif num_frames < self.clip_len:
                starts = [i * num_frames // self.num_clips
                          for i in range(self.num_clips)]
                inds = np.concatenate(
                    [np.arange(i, i + self.clip_len) for i in starts])
            else:
                inds = np.concatenate([self._sample_once(num_frames, rng)
                                       for _ in range(self.num_clips)])
        else:
            assert self.num_clips == 1
            inds = self._sample_once(num_frames, self.rng)
        inds = np.mod(inds, num_frames) + results.get("start_index", 0)
        results["frame_inds"] = inds.astype(np.int64)
        results["clip_len"] = self.clip_len
        results["frame_interval"] = None
        results["num_clips"] = self.num_clips
        return results


@PIPELINES.register("PaddingWithLoop")
class PaddingWithLoop:
    """pose_loading.py:635-667: frames 0..clip_len looped over the video."""

    def __init__(self, clip_len: int, num_clips: int = 1):
        self.clip_len = clip_len
        self.num_clips = num_clips

    def __call__(self, results: Dict) -> Dict:
        inds = np.mod(np.arange(self.clip_len), results["total_frames"])
        results["frame_inds"] = inds.astype(np.int64)
        results["clip_len"] = self.clip_len
        results["frame_interval"] = None
        results["num_clips"] = self.num_clips
        return results


@PIPELINES.register("PoseDecode")
class PoseDecode:
    """pose_loading.py:142-196: gather keypoints (M, T, V, C) and scores
    (M, T, V) at frame_inds."""

    def __call__(self, results: Dict) -> Dict:
        if "frame_inds" not in results:
            results["frame_inds"] = np.arange(results["total_frames"])
        inds = np.asarray(results["frame_inds"])
        if inds.ndim != 1:   # reference guard (pose_loading.py:177):
            inds = np.squeeze(inds)   # a clip_len=1 (1,) keeps its axis
        inds = inds + results.get("offset", 0)
        if "keypoint_score" in results:
            results["keypoint_score"] = \
                results["keypoint_score"][:, inds].astype(np.float32)
        if "keypoint" in results:
            results["keypoint"] = \
                results["keypoint"][:, inds].astype(np.float32)
        return results


@PIPELINES.register("LoadKineticsPose")
class LoadKineticsPose:
    """pose_loading.py:199-343: unpack the per-detection (x, y, score)
    pickle into dense (num_person, T, V, 2) + scores, squeezing empty
    frames and dropping low-confidence persons beyond max_person by the
    face/torso/limb-weighted score."""

    _SUBSETS = {
        "openpose-18": dict(face=[0, 14, 15, 16, 17], torso=[1, 2, 8, 5, 11],
                            limb=[3, 4, 6, 7, 9, 10, 12, 13]),
        "mmpose": dict(face=[0, 1, 2, 3, 4], torso=[5, 6, 11, 12],
                       limb=[7, 8, 9, 10, 13, 14, 15, 16]),
    }

    def __init__(self, squeeze: bool = True, max_person: int = 100,
                 keypoint_weight: Optional[Dict] = None,
                 source: str = "mmpose"):
        if source not in self._SUBSETS:
            raise NotImplementedError(source)
        self.squeeze = squeeze
        self.max_person = max_person
        self.weight = dict(keypoint_weight or dict(face=1, torso=2, limb=3))
        self.source = source
        self.kpsubset = self._SUBSETS[source]

    def __call__(self, results: Dict) -> Dict:
        filename = results.pop("filename")
        anno_inds = results.pop("anno_inds", None)
        results.pop("box_score", None)
        with open(filename, "rb") as f:
            kps = pickle.load(f)
        total_frames = results["total_frames"]
        frame_inds = np.asarray(results.pop("frame_inds"))
        if anno_inds is not None:
            assert self.source == "mmpose"
            kps = kps[anno_inds]
            frame_inds = frame_inds[anno_inds]
        if self.squeeze:
            uni = {x: i for i, x in enumerate(np.unique(frame_inds))}
            frame_inds = np.array([uni[x] for x in frame_inds], np.int64)
            total_frames = int(frame_inds.max()) + 1
        results["total_frames"] = total_frames

        h, w = results["img_shape"]
        kps = np.asarray(kps, np.float32).copy()
        if self.source == "openpose-18":
            kps[:, :, 0] *= w
            kps[:, :, 1] *= h

        num_kp = kps.shape[1]
        counts = np.bincount(frame_inds, minlength=total_frames)
        num_person = int(counts.max()) if counts.size else 0
        new_kp = np.zeros([num_person, total_frames, num_kp, 2], np.float16)
        new_score = np.zeros([num_person, total_frames, num_kp], np.float16)
        cursor = np.zeros([total_frames], np.int64)
        for fi, kp in zip(frame_inds, kps):
            p = cursor[fi]
            new_kp[p, fi] = kp[:, :2]
            new_score[p, fi] = kp[:, 2]
            cursor[fi] += 1

        results["num_person"] = num_person
        if num_person > self.max_person:
            grp, wt = self.kpsubset, self.weight
            for i in range(total_frames):
                n = cursor[i]
                val = new_score[:n, i].astype(np.float32)
                score = (val[:, grp["face"]].sum(1) * wt["face"]
                         + val[:, grp["torso"]].sum(1) * wt["torso"]
                         + val[:, grp["limb"]].sum(1) * wt["limb"])
                order = np.argsort(-score)
                new_score[:n, i] = new_score[order, i]
                new_kp[:n, i] = new_kp[order, i]
            results["num_person"] = self.max_person
        results["keypoint"] = new_kp[:self.max_person]
        results["keypoint_score"] = new_score[:self.max_person]
        return results


@PIPELINES.register("PoseNormalize")
class PoseNormalize:
    """pose_loading.py:670-698: (kp - mean) / (max - min) per channel."""

    def __init__(self, mean=(960.0, 540.0, 0.5), min_value=(0.0, 0.0, 0.0),
                 max_value=(1920.0, 1080.0, 1.0)):
        shape = (-1, 1, 1, 1)
        self.mean = np.asarray(mean, np.float32).reshape(shape)
        self.min_value = np.asarray(min_value, np.float32).reshape(shape)
        self.max_value = np.asarray(max_value, np.float32).reshape(shape)

    def __call__(self, results: Dict) -> Dict:
        kp = results["keypoint"]
        results["keypoint"] = (kp - self.mean) / (self.max_value
                                                  - self.min_value)
        results["keypoint_norm_cfg"] = dict(
            mean=self.mean, min_value=self.min_value,
            max_value=self.max_value)
        return results


def _combine_quadruple(a, b):
    return (a[0] + a[2] * b[0], a[1] + a[3] * b[1], a[2] * b[2], a[3] * b[3])


@PIPELINES.register("PoseCompact")
class PoseCompact:
    """augmentations.py:169-290: shrink img_shape to the padded tight box
    around all joints; zero coordinates mark missing joints and are kept
    out of the box (and left untranslated)."""

    def __init__(self, padding: float = 0.25, threshold: int = 10,
                 hw_ratio=None, allow_imgpad: bool = True):
        assert padding >= 0
        self.padding = padding
        self.threshold = threshold
        if hw_ratio is not None and not isinstance(hw_ratio, (tuple, list)):
            hw_ratio = (hw_ratio, hw_ratio)
        self.hw_ratio = hw_ratio
        self.allow_imgpad = allow_imgpad

    def __call__(self, results: Dict) -> Dict:
        h, w = results["img_shape"]
        kp = results["keypoint"]
        kp[np.isnan(kp)] = 0.0
        kp_x, kp_y = kp[..., 0], kp[..., 1]
        if not (kp_x != 0).any() or not (kp_y != 0).any():
            return results
        min_x, max_x = np.min(kp_x[kp_x != 0]), np.max(kp_x[kp_x != 0])
        min_y, max_y = np.min(kp_y[kp_y != 0]), np.max(kp_y[kp_y != 0])
        if max_x - min_x < self.threshold or max_y - min_y < self.threshold:
            return results
        center = ((max_x + min_x) / 2, (max_y + min_y) / 2)
        half_w = (max_x - min_x) / 2 * (1 + self.padding)
        half_h = (max_y - min_y) / 2 * (1 + self.padding)
        if self.hw_ratio is not None:
            half_h = max(self.hw_ratio[0] * half_w, half_h)
            half_w = max(1 / self.hw_ratio[1] * half_h, half_w)
        min_x, max_x = center[0] - half_w, center[0] + half_w
        min_y, max_y = center[1] - half_h, center[1] + half_h
        if not self.allow_imgpad:
            min_x, min_y = int(max(0, min_x)), int(max(0, min_y))
            max_x, max_y = int(min(w, max_x)), int(min(h, max_y))
        else:
            min_x, min_y = int(min_x), int(min_y)
            max_x, max_y = int(max_x), int(max_y)
        kp_x[kp_x != 0] -= min_x
        kp_y[kp_y != 0] -= min_y
        results["img_shape"] = (max_y - min_y, max_x - min_x)
        quad = results.get("crop_quadruple", (0.0, 0.0, 1.0, 1.0))
        results["crop_quadruple"] = _combine_quadruple(
            quad, (min_x / w, min_y / h, (max_x - min_x) / w,
                   (max_y - min_y) / h))
        return results


@PIPELINES.register("JointToBone")
class JointToBone:
    """formatting.py:378-434: bone[v1] = kp[v1] - kp[v2] over the skeleton
    pairs; 3-channel coco/openpose keeps the averaged score."""

    _PAIRS = {
        "nturgb+d": [(0, 1), (1, 20), (2, 20), (3, 2), (4, 20), (5, 4),
                     (6, 5), (7, 6), (8, 20), (9, 8), (10, 9), (11, 10),
                     (12, 0), (13, 12), (14, 13), (15, 14), (16, 0),
                     (17, 16), (18, 17), (19, 18), (21, 22), (20, 20),
                     (22, 7), (23, 24), (24, 11)],
        "openpose-18": [(0, 0), (1, 0), (2, 1), (3, 2), (4, 3), (5, 1),
                        (6, 5), (7, 6), (8, 2), (9, 8), (10, 9), (11, 5),
                        (12, 11), (13, 12), (14, 0), (15, 0), (16, 14),
                        (17, 15)],
        "coco": [(0, 0), (1, 0), (2, 0), (3, 1), (4, 2), (5, 0), (6, 0),
                 (7, 5), (8, 6), (9, 7), (10, 8), (11, 0), (12, 0),
                 (13, 11), (14, 12), (15, 13), (16, 14)],
    }

    def __init__(self, dataset: str = "nturgb+d"):
        if dataset not in self._PAIRS:
            raise ValueError(dataset)
        self.dataset = dataset
        self.pairs = self._PAIRS[dataset]

    def __call__(self, results: Dict) -> Dict:
        kp = results["keypoint"]
        m, t, v, c = kp.shape
        assert c in (2, 3)
        bone = np.zeros((m, t, v, c), np.float32)
        for v1, v2 in self.pairs:
            bone[..., v1, :] = kp[..., v1, :] - kp[..., v2, :]
            if c == 3 and self.dataset in ("openpose-18", "coco"):
                bone[..., v1, 2] = (kp[..., v1, 2] + kp[..., v2, 2]) / 2
        results["keypoint"] = bone
        return results


@PIPELINES.register("FormatGCNInput")
class FormatGCNInput:
    """formatting.py:438-500: (M, T, V, C[+score]) -> NCTVM padded/truncated
    to num_person."""

    def __init__(self, input_format: str = "NCTVM", num_person: int = 2):
        assert input_format == "NCTVM"
        self.num_person = num_person

    def __call__(self, results: Dict) -> Dict:
        kp = results["keypoint"]
        if "keypoint_score" in results:
            kp = np.concatenate(
                [kp, results["keypoint_score"][..., None]], axis=-1)
        kp = np.transpose(kp, (3, 1, 2, 0))  # M T V C -> C T V M
        if kp.shape[-1] < self.num_person:
            pad = np.zeros(kp.shape[:-1] + (self.num_person - kp.shape[-1],),
                           kp.dtype)
            kp = np.concatenate([kp, pad], axis=-1)
        elif kp.shape[-1] > self.num_person:
            kp = kp[..., :self.num_person]
        results["keypoint"] = kp
        results["input_shape"] = kp.shape
        return results


@PIPELINES.register("GeneratePoseTarget")
class GeneratePoseTarget:
    """pose_loading.py:346-633: gaussian keypoint (and limb-segment)
    pseudo-heatmaps, max-combined over persons, stacked (T, H, W, K)."""

    COCO_SKELETONS = ((0, 1), (0, 2), (1, 3), (2, 4), (0, 5), (5, 7), (7, 9),
                      (0, 6), (6, 8), (8, 10), (5, 11), (11, 13), (13, 15),
                      (6, 12), (12, 14), (14, 16), (11, 12))

    def __init__(self, sigma: float = 0.6, use_score: bool = True,
                 with_kp: bool = True, with_limb: bool = False,
                 skeletons: Sequence[Tuple[int, int]] = COCO_SKELETONS,
                 double: bool = False,
                 left_kp=(1, 3, 5, 7, 9, 11, 13, 15),
                 right_kp=(2, 4, 6, 8, 10, 12, 14, 16)):
        assert with_kp or with_limb
        self.sigma = sigma
        self.use_score = use_score
        self.with_kp = with_kp
        self.with_limb = with_limb
        self.skeletons = skeletons
        self.double = double
        self.left_kp = left_kp
        self.right_kp = right_kp
        self.eps = 1e-4

    def _kp_heatmap(self, h, w, centers, max_values):
        heatmap = np.zeros([h, w], np.float32)
        sigma = self.sigma
        for center, max_value in zip(centers, max_values):
            if max_value < self.eps:
                continue
            mu_x, mu_y = center[0], center[1]
            st_x, ed_x = max(int(mu_x - 3 * sigma), 0), \
                min(int(mu_x + 3 * sigma) + 1, w)
            st_y, ed_y = max(int(mu_y - 3 * sigma), 0), \
                min(int(mu_y + 3 * sigma) + 1, h)
            x = np.arange(st_x, ed_x, 1, np.float32)
            y = np.arange(st_y, ed_y, 1, np.float32)[:, None]
            if not (x.size and y.size):
                continue
            patch = np.exp(-((x - mu_x) ** 2 + (y - mu_y) ** 2)
                           / 2 / sigma ** 2) * max_value
            heatmap[st_y:ed_y, st_x:ed_x] = np.maximum(
                heatmap[st_y:ed_y, st_x:ed_x], patch)
        return heatmap

    def _limb_heatmap(self, h, w, starts, ends, svals, evals):
        heatmap = np.zeros([h, w], np.float32)
        sigma = self.sigma
        for start, end, sv, ev in zip(starts, ends, svals, evals):
            coeff_v = min(sv, ev)
            if coeff_v < self.eps:
                continue
            min_x = max(int(min(start[0], end[0]) - 3 * sigma), 0)
            max_x = min(int(max(start[0], end[0]) + 3 * sigma) + 1, w)
            min_y = max(int(min(start[1], end[1]) - 3 * sigma), 0)
            max_y = min(int(max(start[1], end[1]) + 3 * sigma) + 1, h)
            x = np.arange(min_x, max_x, 1, np.float32)
            y = np.arange(min_y, max_y, 1, np.float32)[:, None]
            if not (x.size and y.size):
                continue
            d2_start = (x - start[0]) ** 2 + (y - start[1]) ** 2
            d2_end = (x - end[0]) ** 2 + (y - end[1]) ** 2
            d2_ab = (start[0] - end[0]) ** 2 + (start[1] - end[1]) ** 2
            if d2_ab < 1:
                heatmap = np.maximum(
                    heatmap, self._kp_heatmap(h, w, [start], [sv]))
                continue
            coeff = (d2_start - d2_end + d2_ab) / 2.0 / d2_ab
            a_dom, b_dom = coeff <= 0, coeff >= 1
            seg_dom = 1 - a_dom - b_dom
            pos = np.stack(np.broadcast_arrays(x, y), -1)
            proj = start + coeff[..., None] * (end - start)
            d2_line = ((pos - proj) ** 2).sum(-1)
            d2_seg = a_dom * d2_start + b_dom * d2_end + seg_dom * d2_line
            patch = np.exp(-d2_seg / 2.0 / sigma ** 2) * coeff_v
            heatmap[min_y:max_y, min_x:max_x] = np.maximum(
                heatmap[min_y:max_y, min_x:max_x], patch)
        return heatmap

    def _frame(self, h, w, kps, max_values):
        maps = []
        if self.with_kp:
            for i in range(kps.shape[1]):
                maps.append(self._kp_heatmap(h, w, kps[:, i],
                                             max_values[:, i]))
        if self.with_limb:
            for s, e in self.skeletons:
                maps.append(self._limb_heatmap(
                    h, w, kps[:, s], kps[:, e],
                    max_values[:, s], max_values[:, e]))
        return np.stack(maps, axis=-1)

    def _gen(self, results):
        kps = results["keypoint"]
        scores = results.get(
            "keypoint_score", np.ones(kps.shape[:-1], np.float32))
        h, w = results["img_shape"]
        out = []
        for t in range(kps.shape[1]):
            mv = scores[:, t] if self.use_score else \
                np.ones(scores[:, t].shape, np.float32)
            out.append(self._frame(h, w, kps[:, t].astype(np.float32),
                                   mv.astype(np.float32)))
        return out

    def __call__(self, results: Dict) -> Dict:
        if not self.double:
            results["imgs"] = np.stack(self._gen(results))
            return results
        import copy
        flipped = copy.deepcopy(results)
        _, w = results["img_shape"]
        kp = flipped["keypoint"].copy()
        kp[..., 0] = w - kp[..., 0]
        order = list(range(kp.shape[2]))
        for l, r in zip(self.left_kp, self.right_kp):
            order[l], order[r] = order[r], order[l]
        flipped["keypoint"] = kp[:, :, order]
        results["imgs"] = np.concatenate(
            [self._gen(results), self._gen(flipped)])
        return results


# ---------------------------------------------------------------------------
# geometric / misc
# ---------------------------------------------------------------------------


@PIPELINES.register("RandomCrop")
class RandomCrop:
    """augmentations.py:556-680: square random crop translating imgs,
    keypoints, gt_bboxes and proposals together."""

    def __init__(self, size: int, seed: Optional[int] = None):
        self.size = size
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _box_crop(box, crop_bbox):
        x1, y1, x2, y2 = crop_bbox
        out = box.copy()
        out[..., 0::2] = np.clip(box[..., 0::2] - x1, 0, x2 - x1 - 1)
        out[..., 1::2] = np.clip(box[..., 1::2] - y1, 0, y2 - y1 - 1)
        return out

    @staticmethod
    def _box_crop_normalized(box, x0, y0, size, img_w, img_h):
        """Detection boxes in [0,1] coordinates (our AVA convention;
        mmaction carries pixels and denormalizes at decode instead)."""
        out = np.asarray(box, np.float32).copy()
        out[..., 0::2] = np.clip(
            (out[..., 0::2] - x0 / img_w) * img_w / size, 0.0, 1.0)
        out[..., 1::2] = np.clip(
            (out[..., 1::2] - y0 / img_h) * img_h / size, 0.0, 1.0)
        return out

    def __call__(self, results: Dict) -> Dict:
        img_h, img_w = results["img_shape"]
        assert self.size <= img_h and self.size <= img_w
        y0 = int(self.rng.integers(0, img_h - self.size)) \
            if img_h > self.size else 0
        x0 = int(self.rng.integers(0, img_w - self.size)) \
            if img_w > self.size else 0
        bbox = np.array([x0, y0, x0 + self.size, y0 + self.size])
        if "imgs" in results:
            results["imgs"] = [im[y0:y0 + self.size, x0:x0 + self.size]
                               for im in results["imgs"]]
        if "keypoint" in results:
            results["keypoint"] = results["keypoint"] - bbox[:2]
        normalized = results.get("bbox_coords") == "normalized"
        for key in ("gt_bboxes", "proposals"):
            if results.get(key) is None or not len(results[key]):
                continue
            if normalized:
                results[key] = self._box_crop_normalized(
                    results[key], x0, y0, self.size, img_w, img_h)
            else:
                results[key] = self._box_crop(results[key], bbox)
        quad = results.get("crop_quadruple", (0.0, 0.0, 1.0, 1.0))
        results["crop_quadruple"] = _combine_quadruple(
            quad, (x0 / img_w, y0 / img_h, self.size / img_w,
                   self.size / img_h))
        results["crop_bbox"] = bbox
        results["img_shape"] = (self.size, self.size)
        return results


@PIPELINES.register("RandomRescale")
class RandomRescale:
    """augmentations.py:1171-1220: short side resized to a random int in
    scale_range (closed interval), aspect preserved."""

    def __init__(self, scale_range: Tuple[int, int],
                 seed: Optional[int] = None):
        lo, hi = scale_range
        assert 0 < lo < hi
        self.scale_range = (lo, hi)
        self.rng = np.random.default_rng(seed)

    def __call__(self, results: Dict) -> Dict:
        short = int(self.rng.integers(self.scale_range[0],
                                      self.scale_range[1] + 1))
        results = Resize((-1, short), keep_ratio=True)(results)
        results["short_edge"] = short
        return results


@PIPELINES.register("BuildPseudoClip")
class BuildPseudoClip:
    """loading.py:1611-1640: repeat a single image clip_len times."""

    def __init__(self, clip_len: int):
        self.clip_len = clip_len

    def __call__(self, results: Dict) -> Dict:
        assert len(results["imgs"]) == 1
        results["imgs"] = [results["imgs"][0]] + \
            [np.copy(results["imgs"][0]) for _ in range(1, self.clip_len)]
        results["clip_len"] = self.clip_len
        results["num_clips"] = 1
        return results


@PIPELINES.register("SampleAVAFrames")
class SampleAVAFrames:
    """loading.py:424-467: clip centered on the keyframe timestamp, jittered
    per-frame in train mode, clamped to the shot boundaries."""

    def __init__(self, clip_len: int, frame_interval: int = 2,
                 test_mode: bool = False, seed: Optional[int] = None):
        self.clip_len = clip_len
        self.frame_interval = frame_interval
        self.test_mode = test_mode
        self.rng = np.random.default_rng(seed)

    def __call__(self, results: Dict) -> Dict:
        fps = results["fps"]
        center = fps * (results["timestamp"]
                        - results["timestamp_start"]) + 1
        # AVADataset rawframes mode defaults shot_info=(0, total_frames)
        shot = results.get("shot_info") or (0, results["total_frames"])
        start = center - (self.clip_len // 2) * self.frame_interval
        end = center + ((self.clip_len + 1) // 2) * self.frame_interval
        inds = np.arange(start, end, self.frame_interval)
        if not self.test_mode:
            # reference bounds: randint(-fi // 2, (fi + 1) // 2) where
            # -fi // 2 is floor division of the NEGATED interval —
            # floor(-3/2) = -2, not -(3 // 2) = -1 (odd intervals)
            inds = inds + self.rng.integers(
                (-self.frame_interval) // 2, (self.frame_interval + 1) // 2,
                size=self.clip_len)
        inds = np.clip(inds, shot[0], shot[1] - 1)
        results["frame_inds"] = inds.astype(np.int64) + \
            results.get("start_index", 0)
        results["clip_len"] = self.clip_len
        results["frame_interval"] = self.frame_interval
        results["num_clips"] = 1
        results["crop_quadruple"] = np.array([0, 0, 1, 1], np.float32)
        return results


# ---------------------------------------------------------------------------
# localization features / proposals
# ---------------------------------------------------------------------------


@PIPELINES.register("LoadLocalizationFeature")
class LoadLocalizationFeature:
    """loading.py:1697-1741: csv (T, C) -> raw_feature (C, T)."""

    def __init__(self, raw_feature_ext: str = ".csv"):
        assert raw_feature_ext == ".csv"
        self.raw_feature_ext = raw_feature_ext

    def __call__(self, results: Dict) -> Dict:
        path = os.path.join(results["data_prefix"],
                            results["video_name"] + self.raw_feature_ext)
        raw = np.loadtxt(path, dtype=np.float32, delimiter=",", skiprows=1)
        results["raw_feature"] = np.transpose(raw, (1, 0))
        return results


@PIPELINES.register("GenerateLocalizationLabels")
class GenerateLocalizationLabels:
    """loading.py:1744-1777: annotation segments (seconds) -> gt_bbox in
    [0, 1] of the feature-corrected duration."""

    def __call__(self, results: Dict) -> Dict:
        corrected = (float(results["feature_frame"])
                     / results["duration_frame"]
                     * results["duration_second"])
        gt = [[max(min(1, a["segment"][0] / corrected), 0),
               max(min(1, a["segment"][1] / corrected), 0)]
              for a in results["annotations"]]
        results["gt_bbox"] = np.array(gt)
        return results


@PIPELINES.register("LoadProposals")
class LoadProposals:
    """loading.py:1780-1857: top-k PGM proposals (tmin, tmax, scores,
    reference tIoU) + bsp features."""

    def __init__(self, top_k: int, pgm_proposals_dir: str,
                 pgm_features_dir: str, proposal_ext: str = ".csv",
                 feature_ext: str = ".npy"):
        assert proposal_ext == ".csv" and feature_ext == ".npy"
        self.top_k = top_k
        self.pgm_proposals_dir = pgm_proposals_dir
        self.pgm_features_dir = pgm_features_dir
        self.proposal_ext = proposal_ext
        self.feature_ext = feature_ext

    def __call__(self, results: Dict) -> Dict:
        name = results["video_name"]
        props = np.loadtxt(
            os.path.join(self.pgm_proposals_dir, name + self.proposal_ext),
            dtype=np.float32, delimiter=",", skiprows=1, ndmin=2)
        props = np.array(props[:self.top_k])
        feats = np.load(os.path.join(
            self.pgm_features_dir,
            name + self.feature_ext)).astype(np.float32)
        results["bsp_feature"] = feats[:self.top_k, :]
        results["tmin"] = props[:, 0]
        results["tmax"] = props[:, 1]
        results["tmin_score"] = props[:, 2]
        results["tmax_score"] = props[:, 3]
        results["reference_temporal_iou"] = props[:, 5]
        return results


def _proposal_bounds(proposal) -> Tuple[int, int]:
    if hasattr(proposal, "start_frame"):
        return proposal.start_frame, proposal.end_frame
    return proposal[0], proposal[1]


@PIPELINES.register("SampleProposalFrames")
class SampleProposalFrames:
    """loading.py:470-725: SSN-style three-stage (starting / course /
    ending) segment sampling around each proposal; whole-video strided
    sampling in test mode.  `out_proposals` entries are either reference
    ((rec, proposal), ...) nests, objects with start/end_frame, or plain
    (start, end) tuples."""

    def __init__(self, clip_len: int, body_segments: int,
                 aug_segments: Tuple[int, int], aug_ratio,
                 frame_interval: int = 1, test_interval: int = 6,
                 temporal_jitter: bool = False, mode: str = "train",
                 seed: Optional[int] = None):
        assert mode in ("train", "val", "test")
        self.clip_len = clip_len
        self.body_segments = body_segments
        self.aug_segments = tuple(aug_segments)
        if not isinstance(aug_ratio, (tuple, list)):
            aug_ratio = (aug_ratio, aug_ratio)
        self.aug_ratio = tuple(aug_ratio)
        self.frame_interval = frame_interval
        self.test_interval = test_interval
        self.temporal_jitter = temporal_jitter
        self.mode = mode
        self.rng = np.random.default_rng(seed)

    def _train_indices(self, valid_length: int, num_segments: int):
        avg = (valid_length + 1) // num_segments
        if avg > 0:
            base = np.arange(num_segments) * avg
            return base + self.rng.integers(0, avg, size=num_segments)
        return np.zeros((num_segments,), np.int64)

    @staticmethod
    def _val_indices(valid_length: int, num_segments: int):
        if valid_length >= num_segments:
            avg = valid_length / float(num_segments)
            return (np.arange(num_segments) * avg + avg / 2.0).astype(np.int64)
        return np.zeros((num_segments,), np.int64)

    def _proposal_clips(self, proposal, num_frames: int):
        start_frame, end_frame = _proposal_bounds(proposal)
        ori_clip_len = self.clip_len * self.frame_interval
        duration = end_frame - start_frame
        assert duration != 0
        valid_length = duration - ori_clip_len
        valid_starting = max(
            0, start_frame - int(duration * self.aug_ratio[0]))
        valid_ending = min(num_frames - ori_clip_len + 1,
                           end_frame - 1 + int(duration * self.aug_ratio[1]))
        valid_starting_length = start_frame - valid_starting - ori_clip_len
        valid_ending_length = (valid_ending - end_frame + 1) - ori_clip_len
        pick = (self._train_indices if self.mode == "train"
                else self._val_indices)
        starting = pick(valid_starting_length,
                        self.aug_segments[0]) + valid_starting
        course = pick(valid_length, self.body_segments) + start_frame
        ending = pick(valid_ending_length, self.aug_segments[1]) + end_frame
        return np.concatenate([starting, course, ending])

    def __call__(self, results: Dict) -> Dict:
        total_frames = results["total_frames"]
        if self.mode == "test":
            ori_clip_len = self.clip_len * self.frame_interval
            offsets = np.arange(0, total_frames - ori_clip_len,
                                self.test_interval, dtype=np.int64)
        else:
            proposals = results["out_proposals"]
            offsets = np.concatenate([
                self._proposal_clips(
                    p[0][1] if isinstance(p, (tuple, list))
                    and isinstance(p[0], (tuple, list)) else p, total_frames)
                for p in proposals])
        inds = (offsets[:, None]
                + np.arange(self.clip_len)[None, :] * self.frame_interval)
        inds = np.concatenate(inds)
        if self.temporal_jitter:
            inds = inds + self.rng.integers(0, self.frame_interval,
                                            size=len(inds))
        inds = np.mod(inds, total_frames) + results.get("start_index", 0)
        results["frame_inds"] = inds.astype(np.int64)
        results["clip_len"] = self.clip_len
        results["frame_interval"] = self.frame_interval
        results["num_clips"] = (self.body_segments + self.aug_segments[0]
                                + self.aug_segments[1])
        if self.mode in ("train", "val"):
            results["num_proposals"] = len(results["out_proposals"])
        return results


# ---------------------------------------------------------------------------
# decode / formatting tail
# ---------------------------------------------------------------------------


@PIPELINES.register("ImageDecode")
class ImageDecode:
    """loading.py ImageDecode: read one image file into the imgs list
    (the OmniSource image branch; pairs with BuildPseudoClip)."""

    def __call__(self, results: Dict) -> Dict:
        import cv2

        img = cv2.imread(results["filename"])
        if img is None:
            raise FileNotFoundError(results["filename"])
        img = img[..., ::-1]  # BGR -> RGB like mmcv imfrombytes rgb
        results["imgs"] = [np.ascontiguousarray(img)]
        results["original_shape"] = img.shape[:2]
        results["img_shape"] = img.shape[:2]
        results["total_frames"] = 1
        return results


@PIPELINES.register("ArrayDecode")
class ArrayDecode:
    """loading.py:1350-1390: pick frames from an in-memory 4D array
    (RGB) or flow stack."""

    def __call__(self, results: Dict) -> Dict:
        array = results["array"]
        inds = np.asarray(results["frame_inds"])
        if inds.ndim != 1:   # reference guard (pose_loading.py:177):
            inds = np.squeeze(inds)   # a clip_len=1 (1,) keeps its axis
        inds = inds + results.get("offset", 0)
        modality = results.get("modality", "RGB")
        imgs = []
        for idx in np.atleast_1d(inds):
            if modality == "RGB":
                imgs.append(array[idx])
            elif modality == "Flow":
                imgs.extend([array[idx, ..., 0], array[idx, ..., 1]])
            else:
                raise NotImplementedError(modality)
        results["imgs"] = imgs
        results["original_shape"] = imgs[0].shape[:2]
        results["img_shape"] = imgs[0].shape[:2]
        return results


@PIPELINES.register("Rename")
class Rename:
    """formatting.py:59-81."""

    def __init__(self, mapping: Dict[str, str]):
        self.mapping = dict(mapping)

    def __call__(self, results: Dict) -> Dict:
        for old, new in self.mapping.items():
            if old in results:
                assert new not in results
                results[new] = results.pop(old)
        return results


@PIPELINES.register("Transpose")
class Transpose:
    """formatting.py:146-170."""

    def __init__(self, keys: Sequence[str], order: Sequence[int]):
        self.keys = list(keys)
        self.order = tuple(order)

    def __call__(self, results: Dict) -> Dict:
        for key in self.keys:
            results[key] = np.asarray(results[key]).transpose(self.order)
        return results


@PIPELINES.register("Collect")
class Collect:
    """formatting.py Collect: keep only the requested keys (+ meta under
    'img_metas' when meta_keys given) — the batch contract for trainers."""

    def __init__(self, keys: Sequence[str],
                 meta_keys: Sequence[str] = ()):
        self.keys = list(keys)
        self.meta_keys = list(meta_keys)

    def __call__(self, results: Dict) -> Dict:
        out = {k: results[k] for k in self.keys}
        if self.meta_keys:
            out["img_metas"] = {k: results[k] for k in self.meta_keys
                                if k in results}
        return out
