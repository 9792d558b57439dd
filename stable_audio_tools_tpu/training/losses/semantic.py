"""Semantic/perceptual losses.

Capability parity with reference stable_audio_tools/training/losses/semantic.py:
MelSpectrogramLoss (DAC-style multi-window mel L1, :76-156) and HubertLoss
(:15-72). torchaudio's HuBERT tower isn't available in this image, so
HubertLoss accepts a pluggable feature_fn (e.g. precomputed embeddings) and
otherwise degrades to a clearly-flagged no-op with a warning.
"""

from __future__ import annotations

import logging
import typing as tp

import jax
import jax.numpy as jnp

from ...ops.stft import mel_filterbank, spectrogram

logger = logging.getLogger(__name__)


class MelSpectrogramLoss:
    """DAC-style multi-scale mel loss: log + linear magnitude L1."""

    def __init__(
        self,
        sample_rate: int,
        n_mels: tp.Sequence[int] = (150, 80),
        window_lengths: tp.Sequence[int] = (2048, 512),
        pow: float = 2.0,
        log_weight: float = 1.0,
        mag_weight: float = 1.0,
        clamp_eps: float = 1e-5,
        mel_fmin: tp.Sequence[float] = (0.0, 0.0),
        mel_fmax: tp.Optional[tp.Sequence[float]] = None,
    ):
        self.sample_rate = sample_rate
        self.n_mels = list(n_mels)
        self.window_lengths = list(window_lengths)
        self.pow = pow
        self.log_weight = log_weight
        self.mag_weight = mag_weight
        self.clamp_eps = clamp_eps
        self.fbs = [
            jnp.asarray(mel_filterbank(sample_rate, w, m))
            for w, m in zip(self.window_lengths, self.n_mels)
        ]

    def __call__(self, input, target):
        x = input.reshape(-1, input.shape[-1])
        y = target.reshape(-1, target.shape[-1])
        loss = 0.0
        for w, fb in zip(self.window_lengths, self.fbs):
            hop = w // 4
            xs = spectrogram(x, w, hop, w) @ fb.T
            ys = spectrogram(y, w, hop, w) @ fb.T
            xl = jnp.log10(jnp.clip(xs, self.clamp_eps, None) ** self.pow)
            yl = jnp.log10(jnp.clip(ys, self.clamp_eps, None) ** self.pow)
            loss = loss + self.log_weight * jnp.mean(jnp.abs(xl - yl))
            loss = loss + self.mag_weight * jnp.mean(jnp.abs(xs - ys))
        return loss


class HubertLoss:
    """Feature-space L1 using a pluggable speech tower.

    The reference uses torchaudio HuBERT/WavLM features (semantic.py:15-72).
    Provide feature_fn(audio [B, T]) -> [B, frames, D] (e.g. a Flax port or
    precomputed embeddings); without one the loss is 0 and warns once.
    """

    def __init__(self, weight: float = 1.0, model_name: str = "HUBERT_BASE",
                 feature_fn: tp.Optional[tp.Callable] = None, **_):
        self.weight = weight
        self.feature_fn = feature_fn
        self._warned = False

    def __call__(self, input, target):
        if self.feature_fn is None:
            if not self._warned:
                logger.warning(
                    "HubertLoss: no feature_fn available (torchaudio HuBERT "
                    "not in image); returning 0."
                )
                self._warned = True
            return jnp.zeros(())
        x = input.mean(axis=1) if input.ndim == 3 else input
        y = target.mean(axis=1) if target.ndim == 3 else target
        fx = self.feature_fn(x)
        fy = jax.lax.stop_gradient(self.feature_fn(y))
        return self.weight * jnp.mean(jnp.abs(fx - fy))
