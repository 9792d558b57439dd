"""Dataset transforms (numpy, host-side).

Capability parity with reference stable_audio_tools/data/utils.py:
PadCrop / PadCrop_Normalized_T (:24-72), PhaseFlipper (:74), Stereo/Mono
(:82-100), VolumeNorm with LUFS loudness (:100-139; ITU-R BS.1770 K-weighted
loudness implemented in numpy/scipy instead of torchaudio.transforms.Loudness).
"""

from __future__ import annotations

import math
import random
from typing import Tuple

import numpy as np
from scipy import signal as sps


class PadCrop:
    def __init__(self, n_samples: int, randomize: bool = True):
        self.n_samples = n_samples
        self.randomize = randomize

    def __call__(self, signal: np.ndarray) -> np.ndarray:
        n, s = signal.shape
        start = 0
        if self.randomize and s > self.n_samples:
            start = random.randint(0, s - self.n_samples)
        out = np.zeros((n, self.n_samples), signal.dtype)
        out[:, : min(s, self.n_samples)] = signal[:, start: start + self.n_samples]
        return out


class PadCrop_Normalized_T:
    def __init__(self, n_samples: int, sample_rate: int, randomize: bool = True):
        self.n_samples = n_samples
        self.sample_rate = sample_rate
        self.randomize = randomize

    def __call__(self, source: np.ndarray) -> Tuple:
        n_channels, n_samples = source.shape
        upper_bound = max(0, n_samples - self.n_samples)
        offset = 0
        if self.randomize and n_samples > self.n_samples:
            offset = random.randint(0, upper_bound)
        t_start = offset / (upper_bound + self.n_samples)
        t_end = (offset + self.n_samples) / (upper_bound + self.n_samples)
        chunk = np.zeros((n_channels, self.n_samples), source.dtype)
        chunk[:, : min(n_samples, self.n_samples)] = source[
            :, offset: offset + self.n_samples
        ]
        seconds_start = math.floor(offset / self.sample_rate)
        seconds_total = math.ceil(n_samples / self.sample_rate)
        padding_mask = np.zeros(self.n_samples, np.float32)
        padding_mask[: min(n_samples, self.n_samples)] = 1
        return chunk, t_start, t_end, seconds_start, seconds_total, padding_mask


class PhaseFlipper:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, signal):
        return -signal if random.random() < self.p else signal


class Mono:
    def __call__(self, signal):
        return (
            np.mean(signal, axis=0, keepdims=True) if signal.ndim > 1 else signal
        )


class Stereo:
    def __call__(self, signal):
        if signal.ndim == 1:
            return np.stack([signal, signal])
        if signal.shape[0] == 1:
            return np.concatenate([signal, signal], axis=0)
        if signal.shape[0] > 2:
            return signal[:2]
        return signal


def k_weighting_filters(sample_rate: int):
    """ITU-R BS.1770 K-weighting: shelving + high-pass biquads."""
    # pre-filter (high shelf)
    f0, G, Q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
    K = math.tan(math.pi * f0 / sample_rate)
    Vh = 10 ** (G / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    b_shelf = np.array([
        (Vh + Vb * K / Q + K * K) / a0,
        2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / Q + K * K) / a0,
    ])
    a_shelf = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0])
    # high-pass
    f0, Q = 38.13547087602444, 0.5003270373238773
    K = math.tan(math.pi * f0 / sample_rate)
    den = 1.0 + K / Q + K * K
    b_hp = np.array([1.0, -2.0, 1.0]) / den
    a_hp = np.array([1.0, 2.0 * (K * K - 1.0) / den, (1.0 - K / Q + K * K) / den])
    return (b_shelf, a_shelf), (b_hp, a_hp)


def measure_loudness_lufs(signal: np.ndarray, sample_rate: int) -> float:
    """Integrated loudness (simplified BS.1770, no gating blocks < abs gate)."""
    if signal.ndim == 1:
        signal = signal[None]
    (b1, a1), (b2, a2) = k_weighting_filters(sample_rate)
    weighted = sps.lfilter(b2, a2, sps.lfilter(b1, a1, signal, axis=-1), axis=-1)
    power = np.mean(weighted ** 2, axis=-1).sum()
    return float(-0.691 + 10 * np.log10(power + 1e-12))


class VolumeNorm:
    """LUFS volume normalization + augmentation (reference :100-139)."""

    def __init__(self, params=(-16, 2), sample_rate: int = 16000,
                 energy_threshold: float = 1e-6):
        self.value = params[0]
        self.gain_range = (-params[1], params[1])
        self.sample_rate = sample_rate
        self.energy_threshold = energy_threshold

    def __call__(self, signal: np.ndarray) -> np.ndarray:
        energy = float(np.mean(signal ** 2))
        if energy < self.energy_threshold:
            return signal
        from .native import available, lufs_integrated

        if available():
            input_loudness = lufs_integrated(
                np.ascontiguousarray(signal, np.float32), self.sample_rate
            )
        else:
            input_loudness = measure_loudness_lufs(signal, self.sample_rate)
        target = self.value + random.uniform(*self.gain_range)
        gain = 10.0 ** ((target - input_loudness) / 20.0)
        out = gain * signal
        peak = float(np.max(np.abs(out)))
        if peak >= 1.0:
            out = out / peak * 0.95
        return out
