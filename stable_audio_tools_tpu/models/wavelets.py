"""1-D discrete wavelet transform as strided convs (reference models/wavelets.py).

The reference pulls filterbanks from pywt (bior family); pywt isn't in this
image so the filter banks are embedded: CDF 9/7 ("bior4.4", JPEG2000),
LeGall 5/3 ("bior2.2"), Haar, and db4. Encode stacks [lo, hi] into channels
(2x channels, T/2) per level; decode inverts with transposed convs.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SQRT2 = math.sqrt(2.0)

# analysis lowpass h0, synthesis lowpass g0 (unit-DC normalization), pywt
# convention scales by sqrt(2).
_CDF97_H0 = np.array([
    0.026748757410810, -0.016864118442875, -0.078223266528990,
    0.266864118442875, 0.602949018236360, 0.266864118442875,
    -0.078223266528990, -0.016864118442875, 0.026748757410810,
])
_CDF97_G0 = np.array([
    -0.045635881557125, -0.028771763114250, 0.295635881557125,
    0.557543526228500, 0.295635881557125, -0.028771763114250,
    -0.045635881557125,
])
_LEGALL53_H0 = np.array([-1 / 8, 2 / 8, 6 / 8, 2 / 8, -1 / 8])
_LEGALL53_G0 = np.array([1 / 2, 1, 1 / 2])
_DB4_DEC_LO = np.array([
    -0.010597401784997278, 0.032883011666982945, 0.030841381835986965,
    -0.18703481171888114, -0.02798376941698385, 0.6308807679295904,
    0.7148465705525415, 0.23037781330885523,
])


def _orthogonal_bank(dec_lo: np.ndarray):
    L = len(dec_lo)
    signs = (-1.0) ** np.arange(L)
    dec_hi = signs * dec_lo[::-1]
    return dec_lo, dec_hi, dec_lo[::-1].copy(), dec_hi[::-1].copy()


def _biorthogonal_bank(h0: np.ndarray, g0: np.ndarray):
    """PR construction validated numerically (circular DWT, adjoint IDWT):
    pad h0 left-aligned / g0 shifted by 2; hi filters are rolled
    alternating-sign flips of the dual lowpasses."""
    L = max(len(h0), len(g0)) + 1
    L = L + (L % 2)
    h0p = np.pad(h0, (0, L - len(h0)))
    g0p = np.pad(g0, (2, L - len(g0) - 2))
    signs = (-1.0) ** np.arange(L)
    dec_hi = np.roll(signs * g0p[::-1], 1)
    rec_hi = -np.roll(signs * h0p[::-1], -1)
    return h0p, dec_hi, g0p, rec_hi


@lru_cache(maxsize=8)
def get_filter_bank(wavelet: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (dec_lo, dec_hi, rec_lo, rec_hi), pywt-normalized."""
    if wavelet in ("bior4.4", "cdf97"):
        bank = _biorthogonal_bank(_CDF97_H0 * SQRT2, _CDF97_G0 * SQRT2)
    elif wavelet in ("bior2.2", "legall53"):
        bank = _biorthogonal_bank(_LEGALL53_H0 * SQRT2, _LEGALL53_G0 / SQRT2)
    elif wavelet == "haar":
        bank = _orthogonal_bank(np.array([1.0, 1.0]) / SQRT2)
    elif wavelet == "db4":
        bank = _orthogonal_bank(_DB4_DEC_LO.copy())
    else:
        raise ValueError(f"Unknown wavelet {wavelet}")
    return tuple(np.asarray(f, np.float32) for f in bank)


def _dwt_level(x: jax.Array, dec_lo, dec_hi) -> jax.Array:
    """x: [B, C, T] → [B, 2C, T/2]: per-channel lo/hi with circular padding."""
    B, C, T = x.shape
    L = len(dec_lo)
    xl = jnp.swapaxes(x, 1, 2)  # NLC
    # circular pad so T/2 subbands invert exactly
    pad_l = L // 2 - 1 if L > 2 else 0
    pad_r = L - 2 - pad_l if L > 2 else 0
    xp = jnp.concatenate(
        [xl[:, T - pad_l:, :], xl, xl[:, :pad_r, :]], axis=1
    ) if pad_l or pad_r else xl
    kern = jnp.stack([jnp.asarray(dec_lo), jnp.asarray(dec_hi)], axis=1)  # [L, 2]
    # depthwise 2-output conv per channel: [L, 1, 2] tiled over C groups
    k = jnp.tile(kern[:, None, :], (1, 1, C)).reshape(L, 1, 2 * C)
    out = jax.lax.conv_general_dilated(
        xp, k.astype(x.dtype), window_strides=(2,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
    )
    # output channels interleave [lo_c, hi_c] per channel group
    out = jnp.swapaxes(out, 1, 2)  # [B, 2C, T/2]
    return out


def _idwt_level(z: jax.Array, rec_lo, rec_hi) -> jax.Array:
    """z: [B, 2C, S] → [B, C, 2S] inverse.

    Synthesis is the adjoint of analysis with the (time-reversed) dual
    filters — for a PR filter bank, A_dual^T · A = I, so the vjp of the
    analysis conv gives an exact, jit- and grad-friendly inverse (circular
    halos included).
    """
    B, C2, S = z.shape
    C = C2 // 2
    x0 = jnp.zeros((B, C, 2 * S), z.dtype)
    _, vjp = jax.vjp(
        lambda x: _dwt_level(x, np.asarray(rec_lo)[::-1].copy(),
                             np.asarray(rec_hi)[::-1].copy()),
        x0,
    )
    return vjp(z)[0]


def wavelet_encode(x: jax.Array, wavelet: str, levels: int) -> jax.Array:
    """[B, C, T] → [B, C*2^levels, T/2^levels] (reference WaveletEncode1d)."""
    dec_lo, dec_hi, _, _ = get_filter_bank(wavelet)
    for _ in range(levels):
        x = _dwt_level(x, dec_lo, dec_hi)
    return x


def wavelet_decode(z: jax.Array, wavelet: str, levels: int) -> jax.Array:
    _, _, rec_lo, rec_hi = get_filter_bank(wavelet)
    for _ in range(levels):
        z = _idwt_level(z, rec_lo, rec_hi)
    return z
