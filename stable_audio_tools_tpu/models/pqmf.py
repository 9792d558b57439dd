"""Pseudo-QMF filterbank (reference models/pqmf.py, RAVE-style).

Kaiser-windowed prototype lowpass with numerically-optimized cutoff, cosine
modulation into num_bands subbands, polyphase-equivalent strided conv
analysis; synthesis is the (scaled) adjoint, which for a near-PR PQMF inverts
to within the design attenuation.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from scipy import optimize, signal as sps


def _kaiser_prototype(wc: float, atten: float, M: int) -> np.ndarray:
    beta = sps.kaiser_beta(atten)
    N, _ = sps.kaiserord(atten, wc / np.pi / M)
    N = 2 * (N // 2) + 1  # odd length
    h = sps.firwin(N, wc / np.pi / M, window=("kaiser", beta))
    return h


def _pr_objective(wc, atten, M):
    h = _kaiser_prototype(wc, atten, M)
    g = np.convolve(h, h[::-1], "full")
    # alias-free PR: g decimated at 2M should be a unit impulse
    center = len(g) // 2
    taps = g[center::2 * M]
    err = np.sum(taps[1:] ** 2) + (taps[0] - 1 / (2 * M)) ** 2 * 0
    # normalize: ideal center value after modulation scaling
    return err


@lru_cache(maxsize=8)
def design_pqmf(attenuation: int, num_bands: int) -> np.ndarray:
    """Returns modulated filterbank [num_bands, N]."""
    M = num_bands
    res = optimize.minimize_scalar(
        lambda wc: _pr_objective(wc, attenuation, M),
        bounds=(0.1 * np.pi, np.pi), method="bounded",
    )
    h = _kaiser_prototype(res.x, attenuation, M)
    N = len(h)
    n = np.arange(N)
    hk = np.stack([
        2 * h * np.cos((2 * k + 1) * math.pi / (2 * M) * (n - (N - 1) / 2)
                       + (-1) ** k * math.pi / 4)
        for k in range(M)
    ])
    return hk.astype(np.float32)


def _analysis(x: jax.Array, bank: np.ndarray, M: int) -> jax.Array:
    """x: [B, C, T] → [B, C*M, T/M]."""
    B, C, T = x.shape
    N = bank.shape[1]
    xl = jnp.swapaxes(x, 1, 2)  # NLC
    # per-channel filterbank: out channels ordered [c0 bands..., c1 bands...]
    k = jnp.tile(
        jnp.asarray(bank.T)[:, None, :], (1, 1, C)
    ).reshape(N, 1, M * C)
    pad = N // 2
    out = jax.lax.conv_general_dilated(
        xl, k.astype(x.dtype), window_strides=(M,), padding=[(pad, pad - (M - T % M) % M + (M - 1))][:1],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
    )
    out = out[:, : T // M, :]
    return jnp.swapaxes(out, 1, 2)


def pqmf_analysis(x: jax.Array, attenuation: int = 100, num_bands: int = 16):
    bank = design_pqmf(attenuation, num_bands)
    return _analysis(x, bank, num_bands)


def pqmf_synthesis(z: jax.Array, attenuation: int = 100, num_bands: int = 16):
    """z: [B, C*M, S] → [B, C, S*M] via scaled adjoint of analysis."""
    bank = design_pqmf(attenuation, num_bands)
    M = num_bands
    B, CM, S = z.shape
    C = CM // M
    x0 = jnp.zeros((B, C, S * M), z.dtype)
    _, vjp = jax.vjp(lambda x: _analysis(x, bank, M), x0)
    return vjp(z)[0] * M
