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


def log_mel_spectrogram(wave: jnp.ndarray, n_fft: int = 512,
                        hop: int = 160, n_mels: int = 64,
                        sample_rate: int = 16000) -> jnp.ndarray:
    """wave: (B, S) -> (B, frames, n_mels) log-mel features."""
    B, S = wave.shape
    n_frames = 1 + (S - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])
    frames = wave[:, idx]                           # (B, F, n_fft)
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = jnp.einsum("bfk,km->bfm", power, fb,
                     preferred_element_type=jnp.float32)
    return jnp.log(mel + 1e-6)


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
        return self(log_mel_spectrogram(wave, n_mels=self.cfg.n_mels),
                    train=train)
