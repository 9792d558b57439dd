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
        # one stacked FFT batch over [input; target] per window (exact —
        # spectrogram and the mel matmul are per-sample)
        xy = jnp.concatenate([x, y], axis=0)
        loss = 0.0
        for w, fb in zip(self.window_lengths, self.fbs):
            hop = w // 4
            xs, ys = jnp.split(spectrogram(xy, w, hop, w) @ fb.T, 2, axis=0)
            xl = jnp.log10(jnp.clip(xs, self.clamp_eps, None) ** self.pow)
            yl = jnp.log10(jnp.clip(ys, self.clamp_eps, None) ** self.pow)
            loss = loss + self.log_weight * jnp.mean(jnp.abs(xl - yl))
            loss = loss + self.mag_weight * jnp.mean(jnp.abs(xs - ys))
        return loss


class HubertLoss:
    """Feature-space L1 using a frozen speech tower (reference semantic.py:
    15-72: torchaudio HuBERT/wav2vec2 features, per-layer L1 normalized by
    the target layer's std, averaged over selected feature_ids).

    The tower is the in-repo flax wav2vec2/HuBERT port loaded from a local
    torchaudio-format checkpoint (`ckpt_path`). Alternatively provide
    feature_fn(audio [B, T]) -> [B, frames, D] or list of those (e.g.
    precomputed embeddings). With neither, construction is a hard error
    unless allow_missing=True (then the loss is 0 with a warning) — no
    silent degradation.
    """

    def __init__(self, weight: float = 1.0, model_name: str = "HUBERT_LARGE",
                 feature_ids: tp.Optional[tp.Sequence[int]] = None,
                 ckpt_path: tp.Optional[str] = None,
                 feature_fn: tp.Optional[tp.Callable] = None,
                 allow_missing: bool = False, **_):
        self.weight = weight
        self.feature_ids = list(feature_ids) if feature_ids is not None else None
        self.feature_fn = feature_fn
        self.model_name = model_name
        self._warned = False
        self._tower = None
        if ckpt_path is not None:
            from ...models.wav2vec import load_wav2vec2_tower

            model, variables = load_wav2vec2_tower(ckpt_path, model_name)
            self._tower = (model, variables)
        elif feature_fn is None and not allow_missing:
            raise RuntimeError(
                "HubertLoss needs a local tower checkpoint (ckpt_path) or a "
                "feature_fn; set allow_missing=True to accept a 0 loss."
            )

    def _features(self, wave):
        """wave: [B, T] → list of per-layer features."""
        if self._tower is not None:
            model, variables = self._tower
            conv_only = self.feature_ids == [-1]
            if conv_only:
                return [model.apply(variables, wave,
                                    method=model.conv_features)]
            return model.apply(variables, wave)
        out = self.feature_fn(wave)
        return out if isinstance(out, (list, tuple)) else [out]

    def __call__(self, input, target):
        if self._tower is None and self.feature_fn is None:
            if not self._warned:
                logger.warning("HubertLoss: no tower/feature_fn; returning 0.")
                self._warned = True
            return jnp.zeros(())
        # reference folds channels into batch (semantic.py:11-13)
        x = input.reshape(-1, input.shape[-1]) if input.ndim == 3 else input
        y = target.reshape(-1, target.shape[-1]) if target.ndim == 3 else target
        fxs = self._features(x)
        fys = [jax.lax.stop_gradient(f) for f in self._features(y)]
        conv_only = self.feature_ids == [-1]
        loss, denom = 0.0, 0
        for i, (fx, fy) in enumerate(zip(fxs, fys)):
            if self.feature_ids is None or i in self.feature_ids or conv_only:
                loss = loss + jnp.mean(jnp.abs(fx - fy)) / (jnp.std(fy) + 1e-5)
                denom += 1
        return self.weight * loss / max(denom, 1)
