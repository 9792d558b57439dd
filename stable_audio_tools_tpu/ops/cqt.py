"""True constant-Q transform on XLA (CQT2010-style octave downsampling).

Replaces the nnAudio dependency the reference's BigVGAN CQT discriminator
uses (reference models/discriminators.py:469-593 / nnAudio CQT2010v2). The
algorithm: build complex log-spaced kernels only for the TOP octave (short),
then for each lower octave halve the signal with an anti-aliasing FIR and
reuse the same kernels at half the hop — every octave yields the same frame
rate. The per-octave transform is ONE strided convolution with the complex
kernels (real+imag stacked as output channels): static shapes, no FFT, maps
straight onto the MXU.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _top_octave_kernels(bins_per_octave: int, f_top_min: float, sr: float):
    """Complex CQT kernels for one octave starting at f_top_min.

    Returns (conv kernels [n_fft, 1, 2*bins] float32 — real parts then imag
    parts stacked on the output-channel axis, conjugated — and n_fft)."""
    Q = 1.0 / (2 ** (1.0 / bins_per_octave) - 1)
    freqs = f_top_min * 2 ** (np.arange(bins_per_octave) / bins_per_octave)
    lengths = np.ceil(Q * sr / freqs).astype(int)
    n_fft = int(2 ** np.ceil(np.log2(lengths.max())))
    kernels = np.zeros((bins_per_octave, n_fft), np.complex64)
    for k, (f, l) in enumerate(zip(freqs, lengths)):
        l = min(int(l), n_fft)
        t = (np.arange(l) - l // 2) / sr
        win = 0.5 - 0.5 * np.cos(2 * math.pi * np.arange(l) / l)
        kern = win * np.exp(2j * math.pi * f * t) / l
        start = (n_fft - l) // 2
        kernels[k, start:start + l] = kern
    kc = kernels.conj()  # CQT[k] = sum_t x(t)·conj(kern_k(t))
    taps = np.stack([kc.real, kc.imag], 0)  # [2, bins, n_fft]
    taps = taps.reshape(2 * bins_per_octave, n_fft).T[:, None, :]
    return taps.astype(np.float32), n_fft


# 23-tap half-band lowpass (cutoff 0.25 fs) for the octave decimation chain;
# odd taps are zero by half-band symmetry except the center.
_HALFBAND = np.array([
    -0.000815, 0.0, 0.0049314, 0.0, -0.016397, 0.0, 0.041427, 0.0,
    -0.091226, 0.0, 0.313334, 0.5, 0.313334, 0.0, -0.091226, 0.0,
    0.041427, 0.0, -0.016397, 0.0, 0.0049314, 0.0, -0.000815,
], np.float32)


def _decimate2(x: jax.Array) -> jax.Array:
    """Anti-aliased 2x downsample along the last axis. x: [B, T]."""
    taps = jnp.asarray(_HALFBAND)[:, None, None]  # [K, 1, 1]
    pad = len(_HALFBAND) // 2
    y = jax.lax.conv_general_dilated(
        x[:, :, None], taps, window_strides=(2,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y[:, :, 0]


def cqt(x: jax.Array, sr: int, hop_length: int, fmin: float = 32.7,
        n_octaves: int = 9, bins_per_octave: int = 24,
        complex_output: bool = True):
    """Constant-Q transform. x: [B, T] → complex
    [B, frames, n_octaves*bins_per_octave] (low→high frequency),
    frames = T // hop_length. With complex_output=False returns the
    (real, imag) pair of float arrays instead — some TPU runtimes (axon)
    don't implement complex dtypes, and consumers like the CQT
    discriminator want the parts as channels anyway.

    hop_length must be divisible by 2**(n_octaves-1) (per-octave hops stay
    integral — same constraint as nnAudio CQT2010).
    """
    assert hop_length % (2 ** (n_octaves - 1)) == 0, (
        f"hop_length {hop_length} must divide by 2^{n_octaves - 1}"
    )
    B, T = x.shape
    n_frames = T // hop_length
    f_top_min = fmin * 2 ** (n_octaves - 1)
    f_top_max = f_top_min * 2 ** ((bins_per_octave - 1) / bins_per_octave)
    if f_top_max >= sr / 2:
        # aliased kernels would silently fold the top bins back down;
        # nnAudio's CQT2010 refuses the same configuration
        raise ValueError(
            f"CQT top bin {f_top_max:.0f} Hz >= Nyquist ({sr / 2:.0f} Hz); "
            f"reduce n_octaves (= {n_octaves}) or fmin (= {fmin})"
        )
    taps, n_fft = _top_octave_kernels(bins_per_octave, f_top_min, sr)
    taps = jnp.asarray(taps)  # [n_fft, 1, 2*bins]

    outs = []
    sig = x
    for oct_i in range(n_octaves):  # top octave first
        hop = hop_length // (2 ** oct_i)
        pad = n_fft // 2
        need = (n_frames - 1) * hop + n_fft
        s = jnp.pad(sig, ((0, 0), (pad, max(0, need - sig.shape[1] - pad))))
        out = jax.lax.conv_general_dilated(
            s[:, :, None], taps, window_strides=(hop,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[:, :n_frames]  # [B, frames, 2*bins]
        outs.append((out[..., :bins_per_octave], out[..., bins_per_octave:]))
        if oct_i + 1 < n_octaves:
            sig = _decimate2(sig)
    # outs[0] is the TOP octave; concat low→high
    re = jnp.concatenate([o[0] for o in outs[::-1]], axis=-1)
    im = jnp.concatenate([o[1] for o in outs[::-1]], axis=-1)
    if complex_output:
        return re + 1j * im
    return re, im
