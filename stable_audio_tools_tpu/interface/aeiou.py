"""Audio/latent visualization (reference interface/aeiou.py).

audio_spectrogram_image: mel spectrogram image; tokens_spectrogram_image:
latent channel heatmap; pca_point_cloud: latent PCA scatter. matplotlib-based
(plotly isn't in the image); each returns an RGB numpy array.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from ..ops.stft import mel_filterbank


def _fig_to_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    import matplotlib.pyplot as plt

    plt.close(fig)
    return buf[..., :3].copy()


def audio_spectrogram_image(audio: np.ndarray, sample_rate: int = 48000,
                            n_fft: int = 1024, n_mels: int = 128) -> np.ndarray:
    """audio: [C, T] or [T] → mel-spectrogram image (RGB array)."""
    import matplotlib.pyplot as plt

    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio.mean(0)
    hop = n_fft // 4
    n_frames = max(1 + (len(audio) - n_fft) // hop, 1)
    frames = np.lib.stride_tricks.sliding_window_view(
        np.pad(audio, (0, max(n_fft - len(audio), 0))), n_fft
    )[::hop][:n_frames]
    window = np.hanning(n_fft)
    spec = np.abs(np.fft.rfft(frames * window, axis=-1)) ** 2
    fb = mel_filterbank(sample_rate, n_fft, n_mels)
    mel = spec @ fb.T
    mel_db = 10 * np.log10(np.maximum(mel, 1e-10)).T

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(mel_db, aspect="auto", origin="lower", cmap="magma")
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bin")
    fig.tight_layout()
    return _fig_to_rgb(fig)


def tokens_spectrogram_image(tokens: np.ndarray, title="Tokens") -> np.ndarray:
    """tokens/latents: [C, T] or [B, C, T] → channel heatmap image."""
    import matplotlib.pyplot as plt

    tokens = np.asarray(tokens)
    if tokens.ndim == 3:
        tokens = tokens[0]
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(tokens, aspect="auto", origin="lower", cmap="coolwarm")
    ax.set_title(title)
    ax.set_xlabel("time")
    ax.set_ylabel("channel")
    fig.tight_layout()
    return _fig_to_rgb(fig)


def pca_point_cloud(latents: np.ndarray, color_by_time: bool = True) -> np.ndarray:
    """latents: [B, C, T] → 3-component PCA scatter image."""
    import matplotlib.pyplot as plt

    z = np.asarray(latents)
    if z.ndim == 3:
        z = z[0]
    pts = z.T  # [T, C]
    pts = pts - pts.mean(0)
    # PCA via SVD
    _, _, vt = np.linalg.svd(pts, full_matrices=False)
    proj = pts @ vt[:3].T
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    c = np.arange(len(proj)) if color_by_time else None
    ax.scatter(proj[:, 0], proj[:, 1], proj[:, 2] if proj.shape[1] > 2 else 0,
               c=c, cmap="viridis", s=4)
    fig.tight_layout()
    return _fig_to_rgb(fig)
