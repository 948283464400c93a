"""Audio recognizer, model-layer defaults, CTV bank construction."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.audio import (
    AudioConfig, AudioRecognizer, log_mel_spectrogram, mel_filterbank)
from cross_modal_video_engine_tpu.explain.model_layers import get_model_layers
from cross_modal_video_engine_tpu.cli.ctv_build import build_ctv_banks
from cross_modal_video_engine_tpu.io.video_decode import write_test_video
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3D
from cross_modal_video_engine_tpu.models.timesformer import TimeSformerConfig

rng = np.random.default_rng(481)


def test_mel_filterbank_and_spectrogram():
    fb = mel_filterbank(16, 256, 16000)
    assert fb.shape == (129, 16)
    assert (fb >= 0).all()
    wave = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    spec = log_mel_spectrogram(wave, n_fft=256, hop=128, n_mels=16)
    # librosa-centered framing: 1 + S//hop frames; output is the
    # pipeline-consistent LINEAR-power mel (non-negative)
    assert spec.shape == (2, 1 + 4000 // 128, 16)
    assert np.isfinite(np.asarray(spec)).all()
    assert (np.asarray(spec) >= 0).all()


def test_audio_recognizer():
    cfg = AudioConfig(n_mels=16, channels=(8, 16), num_classes=5)
    m = AudioRecognizer(cfg)
    wave = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    spec = log_mel_spectrogram(wave, n_fft=256, hop=128, n_mels=16)
    variables = m.init(jax.random.key(0), spec)
    scores = m.apply(variables, spec)
    assert scores.shape == (2, 5)
    scores2 = m.apply(variables, wave, method="from_waveform")
    assert scores2.shape == (2, 5)


def test_model_layers():
    m = get_model_layers("timesformer", 12)
    assert m["target"] == 10 and 0 in m["capture"]
    assert get_model_layers("slowfast")["capture"] == [0, 1, 2, 3]
    import pytest
    with pytest.raises(KeyError):
        get_model_layers("unknown_model")


def test_build_ctv_banks(tmp_path):
    ts = TimeSformerConfig(num_frames=4, img_size=32, patch_size=8,
                           embed_dims=16, num_heads=2, num_layers=2,
                           drop_path_max=0.0)
    model = Recognizer3D(ts, num_classes=3)
    v = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), v)

    videos = []
    for i in range(2):
        p = str(tmp_path / f"v{i}.mp4")
        write_test_video(p, rng.integers(0, 255, (16, 40, 48, 3),
                                         dtype=np.uint8))
        videos.append(p)

    def detector(frames_u8):
        return [np.array([[4, 4, 20, 20, 0.9, 0],
                          [24, 10, 38, 30, 0.8, 1]]) for _ in frames_u8]

    pipeline = [
        dict(type="DecordInit"),
        dict(type="SampleFrames", clip_len=4, frame_interval=2, num_clips=1,
             test_mode=True),
        dict(type="DecordDecode"),
        dict(type="Resize", scale=(32, 32), keep_ratio=False),
        dict(type="Normalize", mean=[127.5] * 3, std=[127.5] * 3),
        dict(type="FormatShape", input_format="NTHWC"),
    ]
    banks = build_ctv_banks(model, variables, videos, detector,
                            ["person", "dog"], target_layer=0,
                            pipeline=pipeline, min_frames=1, n_clusters=2)
    assert list(banks["symbolic_names"]) == ["dog", "person"]
    assert banks["symbolic_matrix"].shape == (2, 16)
    assert banks["instance_matrix"].shape == (4, 16)   # 2 videos x 2 concepts
    assert banks["cluster_matrix"].shape[0] == 4       # 2 concepts x 2 clusters
