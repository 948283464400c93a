"""Audio recognition (mmaction recognition_audio family).

Log-mel spectrogram front end computed ON DEVICE (framing via strided
reshape, FFT via jnp.fft.rfft, mel filterbank matmul) feeding a compact
2D ResNet — the AudioRecognizer equivalent of the reference's
spectrogram-based configs.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.registry import BACKBONES, RECOGNIZERS


def slaney_hz_to_mel(f):
    """librosa.hz_to_mel(htk=False): linear below 1 kHz (mel = 3f/200),
    log-spaced above with step ln(6.4)/27 — the Slaney/Auditory-Toolbox
    scale librosa.filters.mel defaults to."""
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10)
                                         / min_log_hz) / logstep,
                    f / f_sp)


def slaney_mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def librosa_mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                           fmin: float = 0.0,
                           fmax: float | None = None) -> np.ndarray:
    """(n_fft//2+1, n_mels) — librosa.filters.mel(htk=False,
    norm='slaney') reimplemented from the published algorithm:
    continuous-frequency triangles between Slaney-mel-spaced centers,
    each filter scaled by 2/(f[m+2]-f[m]) (unit area).  This is what
    the reference's MelSpectrogram pipeline op actually produces
    (augmentations.py:1887-1958 shells out to
    librosa.feature.melspectrogram), so imported audio checkpoints see
    the training-time feature distribution."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    fftfreqs = np.linspace(0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_f = slaney_mel_to_hz(np.linspace(slaney_hz_to_mel(fmin),
                                         slaney_hz_to_mel(fmax),
                                         n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.T.astype(np.float32)       # (n_fft//2+1, n_mels)


def periodic_hann(n: int) -> np.ndarray:
    """scipy.signal.get_window('hann', n, fftbins=True) — what librosa's
    STFT uses; np.hanning is the symmetric variant and differs."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(
        np.float32)


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int) -> np.ndarray:
    """(n_fft//2+1, n_mels) triangular mel filters."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(0), hz_to_mel(sample_rate / 2), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sample_rate).astype(int)
    fb = np.zeros((n_fft // 2 + 1, n_mels), np.float32)
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[k, m - 1] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[k, m - 1] = (hi - k) / (hi - c)
    return fb


def mel_spectrogram(wave: jnp.ndarray, n_fft: int = 512,
                    hop: int = 160, n_mels: int = 64,
                    sample_rate: int = 16000) -> jnp.ndarray:
    """wave: (B, S) -> (B, frames, n_mels) LINEAR-power mel features.

    Matches the training pipeline's MelSpectrogram op exactly
    (data/pipelines_extra.py: librosa semantics — centered/reflect-
    padded frames, PERIODIC hann, Slaney-normalized filterbank, linear
    power): from_waveform must see the same feature distribution a
    checkpoint was trained on; the earlier symmetric-hann + HTK-bin +
    log variant produced a completely different distribution."""
    B, S = wave.shape
    pad = n_fft // 2
    wave = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + S // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])
    frames = wave[:, idx]                           # (B, F, n_fft)
    window = jnp.asarray(periodic_hann(n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(librosa_mel_filterbank(n_mels, n_fft, sample_rate))
    return jnp.einsum("bfk,km->bfm", power, fb,
                      preferred_element_type=jnp.float32)


# transitional alias for earlier callers; note it now returns the
# pipeline-consistent LINEAR mel, not log
log_mel_spectrogram = mel_spectrogram


class _AudioBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, name=n)
        h = nn.relu(bn("bn1")(nn.Conv(self.ch, (3, 3), strides=self.stride,
                                      padding=1, use_bias=False,
                                      name="conv1")(x)))
        h = bn("bn2")(nn.Conv(self.ch, (3, 3), padding=1, use_bias=False,
                              name="conv2")(h))
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=self.stride,
                        use_bias=False, name="down")(x)
        return nn.relu(h + x)


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    n_mels: int = 64
    channels: Tuple[int, ...] = (32, 64, 128)
    num_classes: int = 400


@RECOGNIZERS.register("AudioRecognizer")
class AudioRecognizer(nn.Module):
    cfg: AudioConfig

    @nn.compact
    def __call__(self, spectrogram: jnp.ndarray, *, train: bool = False):
        """spectrogram: (B, frames, n_mels) -> class scores."""
        x = spectrogram[..., None]
        for i, ch in enumerate(self.cfg.channels):
            x = _AudioBlock(ch, 2 if i else 1, name=f"block_{i}")(
                x, train=train)
        feat = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.cfg.num_classes, name="fc_cls")(feat)

    def from_waveform(self, wave: jnp.ndarray, *, train: bool = False):
        return self(mel_spectrogram(wave, n_mels=self.cfg.n_mels),
                    train=train)
