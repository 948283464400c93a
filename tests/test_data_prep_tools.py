"""Dataset-prep CLI tools (cli/data_tools.py: build_rawframes,
build_file_list, extract_audio, build_audio_features) + native audio
extraction (io/native.read_audio, native/decode.cc ad_extract)."""

import os
import wave

import numpy as np
import pytest

from cross_modal_video_engine_tpu.cli.data_tools import main as dt_main
from cross_modal_video_engine_tpu.io.native import native_available, read_audio
from cross_modal_video_engine_tpu.io.video_decode import write_test_video

rng = np.random.default_rng(9)


def _write_wav(path, y, sr=16000, channels=1):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(sr)
        data = y if channels == 1 else np.stack([y] * channels, 1).ravel()
        f.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


def test_native_read_audio_stereo_mean_and_resample(tmp_path):
    if not native_available()["decode"]:
        pytest.skip("native decode lib not built")
    sr = 8000
    t = np.arange(sr) / sr
    y = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    _write_wav(tmp_path / "s.wav", y, sr, channels=2)
    out = read_audio(str(tmp_path / "s.wav"), 8000)
    np.testing.assert_allclose(out[: sr], y, atol=1e-3)
    out2 = read_audio(str(tmp_path / "s.wav"), 16000)
    assert abs(len(out2) - 2 * sr) <= 32  # resampler edge slack


def test_read_audio_no_audio_stream(tmp_path):
    if not native_available()["decode"]:
        pytest.skip("native decode lib not built")
    path = str(tmp_path / "v.avi")
    write_test_video(path, rng.integers(0, 255, (4, 32, 32, 3),
                                        dtype=np.uint8))
    assert read_audio(path, 16000) is None  # video-only container


def test_build_rawframes_and_file_list(tmp_path):
    src = tmp_path / "videos"
    for cls in ("jump", "run"):
        (src / cls).mkdir(parents=True)
        write_test_video(str(src / cls / f"{cls}1.avi"),
                         rng.integers(0, 255, (6, 48, 64, 3),
                                      dtype=np.uint8))
    out = tmp_path / "rawframes"
    dt_main(["build_rawframes", "--src_dir", str(src),
             "--out_dir", str(out), "--ext", "avi", "--new_short", "32"])
    frames = sorted(os.listdir(out / "jump" / "jump1"))
    assert frames[0] == "img_00001.jpg" and len(frames) == 6
    import cv2
    img = cv2.imread(str(out / "jump" / "jump1" / "img_00001.jpg"))
    assert min(img.shape[:2]) == 32  # short side resized

    ann = tmp_path / "ann_raw.txt"
    dt_main(["build_file_list", "--src_dir", str(out),
             "--output", str(ann), "--format", "rawframes"])
    lines = ann.read_text().splitlines()
    assert lines[0].split() == ["jump/jump1", "6", "0"]
    assert lines[1].split() == ["run/run1", "6", "1"]

    ann_v = tmp_path / "ann_v.txt"
    dt_main(["build_file_list", "--src_dir", str(src),
             "--output", str(ann_v), "--format", "videos"])
    assert ann_v.read_text().splitlines()[0].split() == ["jump/jump1.avi", "0"]
    classes = (str(ann_v) + ".classes.txt")
    assert open(classes).read().split() == ["jump", "run"]


def test_extract_audio_and_features(tmp_path):
    if not native_available()["decode"]:
        pytest.skip("native decode lib not built")
    src = tmp_path / "media"
    src.mkdir()
    sr = 16000
    t = np.arange(sr) / sr
    _write_wav(src / "a.wav", (0.3 * np.sin(2 * np.pi * 500 * t)), sr)

    wavs = tmp_path / "wavs"
    # .wav containers also pass through the native extractor
    dt_main(["extract_audio", "--src_dir", str(src),
             "--out_dir", str(wavs), "--ext", "wav"])
    assert (wavs / "a.wav").exists()

    feats = tmp_path / "feats"
    dt_main(["build_audio_features", "--src_dir", str(wavs),
             "--out_dir", str(feats)])
    mel = np.load(feats / "a.npy")
    assert mel.shape[1] == 80
    assert mel.shape[0] > 50          # ~62 frames for 1 s at 16 ms hop
    assert np.isfinite(mel).all()

    # the offline features feed the AudioFeatureSelector pipeline op
    from cross_modal_video_engine_tpu.data.pipelines_extra import (
        AudioFeatureSelector, LoadAudioFeature)
    res = LoadAudioFeature()({"audio_path": str(feats / "a.npy")})
    res.update(frame_inds=np.arange(8), num_clips=1, total_frames=16)
    out = AudioFeatureSelector(fixed_length=32)(res)
    assert out["audios"].shape == (1, 32, 80)


def test_audio_decode_init_native_container(tmp_path):
    """AudioDecodeInit routes non-wav paths through the native decoder."""
    if not native_available()["decode"]:
        pytest.skip("native decode lib not built")
    from cross_modal_video_engine_tpu.data.pipelines_extra import (
        AudioDecodeInit)
    # a video-only avi: no audio stream -> dummy pad, not a crash
    path = str(tmp_path / "v.avi")
    write_test_video(path, rng.integers(0, 255, (4, 32, 32, 3),
                                        dtype=np.uint8))
    out = AudioDecodeInit(sample_rate=4000)({"audio_path": path})
    assert out["audios"].shape == (40000,)
