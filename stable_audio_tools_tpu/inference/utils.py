"""Audio prep utilities (reference stable_audio_tools/inference/utils.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def set_audio_channels(audio, target_channels):
    """audio: [B, C, T] → [B, target_channels, T] (reference :5-19)."""
    if target_channels == 1:
        return audio.mean(1, keepdims=True)
    if target_channels == 2:
        if audio.shape[1] == 1:
            return jnp.concatenate([audio, audio], axis=1) if isinstance(
                audio, jnp.ndarray
            ) else np.concatenate([audio, audio], axis=1)
        return audio[:, :2, :]
    assert audio.shape[1] >= target_channels
    return audio[:, :target_channels, :]


def prepare_audio(audio, in_sr, target_sr, target_length, target_channels):
    """Resample + pad/crop + channel-fix (reference :21-38)."""
    from ..data.resample import resample_poly_np

    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None, None, :]
    elif audio.ndim == 2:
        audio = audio[None, :, :]
    if in_sr != target_sr:
        audio = np.stack([
            np.stack([resample_poly_np(ch, in_sr, target_sr) for ch in b]) for b in audio
        ])
    T = audio.shape[-1]
    if T < target_length:
        audio = np.pad(audio, ((0, 0), (0, 0), (0, target_length - T)))
    else:
        audio = audio[..., :target_length]
    return set_audio_channels(audio, target_channels)
