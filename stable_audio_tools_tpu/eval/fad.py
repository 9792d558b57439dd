"""Offline Fréchet Audio Distance (FAD) on the in-repo CLAP audio tower.

The BASELINE north star asks for "FAD parity vs reference", but the
reference ships no FAD tooling at all (SURVEY.md §6 — no quality metrics
anywhere). This module is the measurement instrument: embed two audio sets
with the HTSAT/CLAP audio branch (models/htsat.py — the same embedding
family public FAD toolkits use as `clap-laion-audio`) and compute the
Fréchet distance between gaussian fits of the embedding clouds.

Fully offline: point `clap_ckpt_path` at a local CLAP checkpoint for
meaningful absolute numbers; `allow_random_init=True` exercises the full
pipeline without weights (relative/self-consistency checks only — a
random tower's FAD is not comparable across runs).
"""

from __future__ import annotations

import typing as tp

import numpy as np


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """FD(N(mu1, S1), N(mu2, S2)) = |mu1-mu2|^2 + Tr(S1+S2-2 sqrt(S1 S2)).

    The matrix sqrt uses scipy when available, else an eigendecomposition
    of the symmetrized product (both covariance estimates are PSD up to
    numerical noise; tiny negative eigenvalues are clipped).
    """
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    offset = eps * np.eye(sigma1.shape[0])
    prod = (sigma1 + offset) @ (sigma2 + offset)
    try:
        import scipy.linalg

        covmean = scipy.linalg.sqrtm(prod)
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        tr_covmean = float(np.trace(covmean))
    except Exception:
        # sqrt(S1 S2) has the same trace as sqrt of the symmetrized
        # S2^1/2 S1 S2^1/2 (similar matrices); eigendecompose that
        w2, v2 = np.linalg.eigh(sigma2 + offset)
        s2h = (v2 * np.sqrt(np.clip(w2, 0, None))) @ v2.T
        m = s2h @ (sigma1 + offset) @ s2h
        w = np.linalg.eigvalsh((m + m.T) / 2)
        tr_covmean = float(np.sum(np.sqrt(np.clip(w, 0, None))))
    # FD is nonnegative; the eps offset / sqrtm noise can push the estimate
    # a few 1e-5 below zero for identical inputs — clamp
    return float(max(0.0, diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_covmean))


def embedding_stats(embeddings: np.ndarray) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Gaussian fit (mean, covariance) of an [N, D] embedding cloud."""
    e = np.asarray(embeddings, np.float64)
    assert e.ndim == 2, f"expected [N, D] embeddings, got {e.shape}"
    mu = e.mean(axis=0)
    sigma = np.cov(e, rowvar=False)
    if sigma.ndim == 0:  # N==1 degenerate
        sigma = np.zeros((e.shape[1], e.shape[1]))
    return mu, sigma


class CLAPEmbedder:
    """Audio → 512-d CLAP joint embedding via the in-repo HTSAT tower.

    Accepts audio at any sample rate ([T], [C, T], or [B, C, T] arrays);
    mixes to mono, resamples to CLAP's 48 kHz, and runs the jitted
    tower+projection from CLAPAudioConditioner (conditioners.py:626-705).
    """

    CLAP_SR = 48000

    def __init__(self, clap_ckpt_path: tp.Optional[str] = None,
                 audio_model_type: str = "HTSAT-base",
                 enable_fusion: bool = True,
                 allow_random_init: bool = False,
                 batch_size: int = 8):
        from ..models.conditioners import CLAPAudioConditioner

        self._cond = CLAPAudioConditioner(
            "fad_embedder", output_dim=512, clap_ckpt_path=clap_ckpt_path,
            audio_model_type=audio_model_type, enable_fusion=enable_fusion,
            allow_random_init=allow_random_init,
        )
        self.batch_size = batch_size

    def _to_mono_48k(self, audio, sample_rate: int) -> np.ndarray:
        from ..data.resample import resample_poly_np

        a = np.asarray(audio, np.float32)
        if a.ndim == 2:  # [C, T] → mono
            a = a.mean(axis=0)
        assert a.ndim == 1, f"expected [T] or [C, T], got {a.shape}"
        if sample_rate != self.CLAP_SR:
            # resample_poly_np is 1-D (resamples along axis 0)
            a = np.asarray(resample_poly_np(a, sample_rate, self.CLAP_SR),
                           np.float32)
        return a

    def embed(self, audios: tp.Sequence[np.ndarray],
              sample_rate: int) -> np.ndarray:
        """audios: sequence of [T] or [C, T] clips → [N, 512] embeddings."""
        clips = [self._to_mono_48k(a, sample_rate) for a in audios]
        out = []
        for i in range(0, len(clips), self.batch_size):
            feats = self._cond.prepare(clips[i:i + self.batch_size])
            out.append(np.asarray(feats["features"], np.float32))
        return np.concatenate(out, axis=0)


def fad_between(real_audios: tp.Sequence[np.ndarray],
                fake_audios: tp.Sequence[np.ndarray],
                sample_rate: int,
                embedder: tp.Optional[CLAPEmbedder] = None,
                **embedder_kwargs) -> float:
    """FAD between two sets of audio clips at `sample_rate`.

    Each set may be a [B, C, T] array or a list of [C, T]/[T] clips.
    """
    if embedder is None:
        embedder = CLAPEmbedder(**embedder_kwargs)

    def aslist(x):
        if isinstance(x, np.ndarray) and x.ndim == 3:
            return list(x)
        return list(x)

    e_real = embedder.embed(aslist(np.asarray(real_audios)), sample_rate)
    e_fake = embedder.embed(aslist(np.asarray(fake_audios)), sample_rate)
    mu_r, s_r = embedding_stats(e_real)
    mu_f, s_f = embedding_stats(e_fake)
    return frechet_distance(mu_r, s_r, mu_f, s_f)
