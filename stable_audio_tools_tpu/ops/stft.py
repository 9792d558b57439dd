"""STFT/mel utilities on XLA FFT (torch.stft-compatible framing).

torch.stft(center=True) semantics: reflect-pad n_fft//2 each side, frame with
hop_length, window, rfft. Frames = 1 + T // hop.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def hann_window(win_length: int) -> np.ndarray:
    # torch.hann_window(periodic=True)
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2 * math.pi * n / win_length)).astype(np.float32)


def stft(x: jax.Array, n_fft: int, hop_length: int, win_length: int,
         window: jax.Array = None, center: bool = True) -> jax.Array:
    """x: [..., T] → complex [..., frames, n_fft//2+1]."""
    if window is None:
        window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x, n_fft, hop_length)
    frames = frames * window
    return jnp.fft.rfft(frames, axis=-1)


def _frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Overlapping frames [..., T] → [..., n_frames, n_fft] without gathers.

    View x as hop-sized blocks; frame j is blocks [j, j+r) flattened and
    truncated to n_fft, with r = ceil(n_fft/hop). Pure slice+concat+reshape,
    so the VJP is shifted pad+adds — the gather formulation's transpose is a
    scatter that measured ~54 ms/step-pair across the GAN step's STFT stack
    (12 loss resolutions + 5 discriminator scales).
    """
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    r = -(-n_fft // hop)
    nb = n_frames + r - 1  # hop-blocks spanned by the last frame
    Tpad = nb * hop
    if Tpad > T:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Tpad - T)])
    elif Tpad < T:
        x = x[..., :Tpad]
    blocks = x.reshape(*x.shape[:-1], nb, hop)
    segs = [blocks[..., k:k + n_frames, :] for k in range(r)]
    frames = jnp.concatenate(segs, axis=-1)  # [..., n_frames, r*hop]
    return frames[..., :n_fft]


def spectrogram(x, n_fft, hop_length, win_length, power=1.0, eps=1e-8, center=True):
    mag = stft_mag_conv(x, n_fft, hop_length, win_length, center=center, eps=eps)
    if power != 1.0:
        mag = mag ** power
    return mag


@lru_cache(maxsize=32)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float = None, htk: bool = True,
                   norm: str = None) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1].

    htk=True (default, existing behavior): HTK mel scale, no normalization.
    htk=False + norm='slaney': librosa defaults (what torchlibrosa /
    laion-clap's LogmelFilterBank build)."""
    fmax = fmax or sr / 2

    if htk:
        def hz_to_mel(f):
            return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

        def mel_to_hz(m):
            return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
    else:
        # Slaney scale: linear below 1 kHz, log above
        def hz_to_mel(f):
            f = np.asarray(f, np.float64)
            mel = f / (200.0 / 3.0)
            log_step = np.log(6.4) / 27.0
            return np.where(f >= 1000.0,
                            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / log_step,
                            mel)

        def mel_to_hz(m):
            m = np.asarray(m, np.float64)
            log_step = np.log(6.4) / 27.0
            return np.where(m >= 15.0, 1000.0 * np.exp(log_step * (m - 15.0)),
                            200.0 / 3.0 * m)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        lo, ctr, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-8)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-8)
        fb[i] = np.clip(np.minimum(up, down), 0, None)
    if norm == "slaney":
        enorm = 2.0 / (freqs[2: n_mels + 2] - freqs[:n_mels])
        fb *= enorm[:, None].astype(np.float32)
    return fb


def a_weighting_fir(ntaps: int = 101, sr: int = 44100) -> np.ndarray:
    """FIR approximation of IEC 61672 A-weighting (auraloss FIRFilter 'aw')."""
    from scipy import signal as sps

    f = np.linspace(1.0, sr / 2, 512)
    f2 = f ** 2
    ra = (12194 ** 2 * f2 ** 2) / (
        (f2 + 20.6 ** 2)
        * np.sqrt((f2 + 107.7 ** 2) * (f2 + 737.9 ** 2))
        * (f2 + 12194 ** 2)
    )
    a_db = 20 * np.log10(ra) + 2.0
    gains = 10 ** (a_db / 20)
    freqs_norm = np.concatenate([[0.0], f / (sr / 2)])
    gains = np.concatenate([[0.0], gains])
    freqs_norm[-1] = 1.0
    taps = sps.firwin2(ntaps, freqs_norm, gains)
    return taps.astype(np.float32)


_FIR_FOLD = 128  # fold samples into 128 channels: full MXU/VPU lane width


@lru_cache(maxsize=8)
def _fir_toeplitz_kernel(taps_key, ntaps: int) -> np.ndarray:
    """Taps [ntaps] → banded conv kernel [kw, F, F] over _FIR_FOLD-sample
    frames, exactly equivalent to same-centered FIR filtering.

    y[128f+co] = sum_k h[k] x[128f+co+k-pad]  (correlation, torch F.conv1d
    semantics; pad = ntaps//2, zero edges) with x folded [T] → [T/128, 128]:
    K[jj, ci, co] = h[128(jj-c) + ci - co + pad]. A C=1 depthwise FIR conv
    runs at a pathological T(1,128) layout on TPU (~10 ms per [8,32768]
    call, measured in the GAN-step trace); this folded form is one
    full-lane matmul-conv."""
    taps = np.asarray(taps_key, np.float32)
    pad = ntaps // 2
    F = _FIR_FOLD
    # frame offsets jj-c must cover k = 128(jj-c) + ci - co + pad ∈ [0, ntaps)
    reach_l = (pad + F - 1) // F              # frames back
    reach_r = (ntaps - 1 - pad + F - 1) // F  # frames forward
    kw = reach_l + reach_r + 1
    c = reach_l
    k_idx = (np.arange(F)[None, :, None]      # ci
             - np.arange(F)[None, None, :]    # co
             + pad
             + F * (np.arange(kw)[:, None, None] - c))
    valid = (k_idx >= 0) & (k_idx < ntaps)
    kern = np.where(valid, taps[np.clip(k_idx, 0, ntaps - 1)], 0.0)
    return kern.astype(np.float32), c, kw - 1 - c


def apply_fir(x: jax.Array, taps: np.ndarray) -> jax.Array:
    """x: [B, C, T] or [B, T]; same-length FIR filtering (zero edge pad).

    Equivalent to torch F.conv1d(x, taps, padding=ntaps//2) per channel, but
    run over 128-sample frames as a [kw,128,128] banded conv so it uses the
    full TPU lane width (exact: tests/test_stft.py)."""
    orig_shape = x.shape
    T = x.shape[-1]
    flat = x.reshape(-1, T)
    F = _FIR_FOLD
    Tp = -(-T // F) * F
    if Tp != T:
        flat = jnp.pad(flat, ((0, 0), (0, Tp - T)))
    kern, pl, pr = _fir_toeplitz_kernel(tuple(np.asarray(taps, np.float32)),
                                        len(taps))
    out = jax.lax.conv_general_dilated(
        flat.reshape(flat.shape[0], Tp // F, F),
        jnp.asarray(kern).astype(x.dtype),
        window_strides=(1,), padding=[(pl, pr)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(flat.shape[0], Tp)[:, :T].reshape(orig_shape)


@lru_cache(maxsize=64)
def _dft_conv_kernel(n_fft: int, win_length: int, fold: int,
                     normalized: bool, interleave: bool) -> np.ndarray:
    """Windowed real-DFT basis as a conv kernel [n_fft//fold, fold, 2*bins].

    Output channel order: [re_0..re_B, im_0..im_B] (interleave=False) or
    [re_0, im_0, re_1, im_1, ...] (interleave=True). Matches
    rfft(frame * window): X_b = sum_n w[n] x[n] e^{-2πi b n / n_fft}."""
    win = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    if normalized:
        win = win / np.sqrt(np.sum(win ** 2))
    bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    b = np.arange(bins)[None, :]
    ang = 2.0 * np.pi * n * b / n_fft
    re = (win[:, None] * np.cos(ang)).astype(np.float32)
    im = (-win[:, None] * np.sin(ang)).astype(np.float32)
    if interleave:
        k = np.stack([re, im], axis=-1).reshape(n_fft, 2 * bins)
    else:
        k = np.concatenate([re, im], axis=-1)
    return k.reshape(n_fft // fold, fold, 2 * bins)


def stft_reim_conv(x: jax.Array, n_fft: int, hop_length: int, win_length: int,
                   center: bool = True, normalized: bool = False,
                   interleave: bool = False) -> jax.Array:
    """STFT as ONE strided MXU convolution: x [..., T] → f32
    [..., frames, 2*bins] real/imag parts (channel order per `interleave`).

    Exactly the framing/window/rfft semantics of stft() (same frame count,
    torch-style reflect center pad), but as a windowed-DFT-basis conv —
    no unfold reshapes, no pads, no VPU FFT; forward AND backward are
    single MXU convs. The DFT matmul runs at Precision.HIGHEST, ~1e-6
    relative vs jnp.fft.rfft (tests/test_stft.py). Replaces the rfft path
    in the STFT losses and the MS-STFT discriminator front-end, where the
    unfold+fft op soup measured ~25% of the whole VAE-GAN step pair."""
    T = x.shape[-1]
    lead = x.shape[:-1]
    flat = x.reshape(-1, T).astype(jnp.float32)
    if center:
        pad = n_fft // 2
        flat = jnp.pad(flat, ((0, 0), (pad, pad)), mode="reflect")
        T = T + 2 * pad
    # fold the signal into hop-or-smaller channels: free row-major reshape,
    # and the conv then reads unstrided full-lane frames
    fold = math.gcd(n_fft, hop_length)
    kern = jnp.asarray(_dft_conv_kernel(n_fft, win_length, fold,
                                        normalized, interleave))
    Tp = -(-T // fold) * fold
    if Tp != T:
        flat = jnp.pad(flat, ((0, 0), (0, Tp - T)))
    out = jax.lax.conv_general_dilated(
        flat.reshape(flat.shape[0], Tp // fold, fold),
        kern,
        window_strides=(hop_length // fold,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    n_frames = 1 + (T - n_fft) // hop_length
    out = out[:, :n_frames]
    return out.reshape(*lead, n_frames, out.shape[-1])


def stft_mag_conv(x: jax.Array, n_fft: int, hop_length: int, win_length: int,
                  center: bool = True, eps: float = 1e-8) -> jax.Array:
    """|STFT| via the conv-DFT path: [..., T] → f32 [..., frames, bins]."""
    reim = stft_reim_conv(x, n_fft, hop_length, win_length, center=center)
    bins = n_fft // 2 + 1
    re, im = reim[..., :bins], reim[..., bins:]
    return jnp.sqrt(jnp.clip(re * re + im * im, eps, None))


@lru_cache(maxsize=64)
def _dft_conv_kernel_framepacked(n_fft: int, win_length: int, hop: int,
                                 k: int, fold: int,
                                 normalized: bool) -> np.ndarray:
    """DFT basis computing k consecutive frames per conv position.

    Kernel [rows, fold, 2*k*bins]: channel j*bins+b of the first (re) half
    is frame j's bin b, basis shifted by j*hop rows; im half follows. The
    small-n_fft loss STFTs ([.., frames, 17..65] channels) waste 50-87% of
    the 128-lane tile; packing k frames into channels fills the lanes and
    shrinks the tensors the downstream mag/log chains stream by the same
    factor."""
    base = _dft_conv_kernel(n_fft, win_length, 1, normalized, False)
    base = base.reshape(n_fft, -1)  # [n_fft, 2*bins]
    bins = n_fft // 2 + 1
    L = n_fft + (k - 1) * hop
    rows = -(-L // fold)
    kern = np.zeros((rows * fold, 2 * k * bins), np.float32)
    for j in range(k):
        kern[j * hop:j * hop + n_fft, j * bins:(j + 1) * bins] = base[:, :bins]
        kern[j * hop:j * hop + n_fft,
             (k + j) * bins:(k + j + 1) * bins] = base[:, bins:]
    return kern.reshape(rows, fold, 2 * k * bins)


def stft_mag_conv_framepacked(
    x: jax.Array, n_fft: int, hop_length: int, win_length: int, k: int,
    center: bool = True, eps: float = 1e-8, normalized: bool = False,
):
    """|STFT| with k frames packed into channels.

    [..., T] → (mag f32 [..., n_packed, k*bins], n_frames, mask) where
    mag[..., p, j*bins + b] = |STFT|[..., p*k + j, b]. Positions past
    n_frames (the last packed step when k doesn't divide the frame count)
    see zero-padded signal, so their re/im are exactly 0 and mag is exactly
    sqrt(eps); `mask` is a static [n_packed, k*bins] 0/1 array selecting
    valid frames (None when k divides evenly). Loss reductions stay exact
    by multiplying by mask (sum-style terms) or rescaling means by the
    valid fraction — see training/losses/auraloss.py::STFTLoss."""
    assert k >= 1
    bins = n_fft // 2 + 1
    T = x.shape[-1]
    lead = x.shape[:-1]
    flat = x.reshape(-1, T).astype(jnp.float32)
    if center:
        pad = n_fft // 2
        flat = jnp.pad(flat, ((0, 0), (pad, pad)), mode="reflect")
        T = T + 2 * pad
    n_frames = 1 + (T - n_fft) // hop_length
    n_packed = -(-n_frames // k)
    fold = k * hop_length  # stride 1 in folded space
    kern = jnp.asarray(_dft_conv_kernel_framepacked(
        n_fft, win_length, hop_length, k, fold, normalized))
    rows = kern.shape[0]
    # signal long enough for n_packed positions of the rows*fold window
    need = (n_packed - 1) * fold + rows * fold
    if need > T:
        flat = jnp.pad(flat, ((0, 0), (0, need - T)))
    elif T % fold:
        flat = jnp.pad(flat, ((0, 0), (0, fold - T % fold)))
    Tp = flat.shape[-1]
    out = jax.lax.conv_general_dilated(
        flat.reshape(flat.shape[0], Tp // fold, fold),
        kern,
        window_strides=(1,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out[:, :n_packed]
    re, im = out[..., :k * bins], out[..., k * bins:]
    mag = jnp.sqrt(jnp.clip(re * re + im * im, eps, None))
    mag = mag.reshape(*lead, n_packed, k * bins)
    mask = None
    if n_packed * k != n_frames:
        m = np.zeros((n_packed, k, bins), np.float32)
        m.reshape(n_packed * k, bins)[:n_frames] = 1.0
        mask = m.reshape(n_packed, k * bins)
    return mag, n_frames, mask


@lru_cache(maxsize=16)
def _idft_basis(n_fft: int, win_length: int, torch_normalized: bool) -> np.ndarray:
    """Windowed inverse real-DFT basis [2*bins, n_fft]: per-frame
    irfft(re + i*im) * window, as ONE matmul. torch_normalized inverts
    torch.stft(normalized=True)'s n_fft**-0.5 forward scaling."""
    bins = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    b = np.arange(bins)[:, None]
    ang = 2.0 * np.pi * b * n / n_fft
    wgt = np.full((bins, 1), 2.0)
    wgt[0] = 1.0
    if n_fft % 2 == 0:
        wgt[-1] = 1.0
    re = wgt * np.cos(ang) / n_fft
    im = -wgt * np.sin(ang) / n_fft
    k = np.concatenate([re, im], axis=0)  # [2*bins, n_fft]
    win = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    k = k * win[None, :]
    if torch_normalized:
        k = k * np.sqrt(n_fft)
    return k.astype(np.float32)


@lru_cache(maxsize=32)
def _ola_envelope(n_fft: int, win_length: int, hop: int, n_frames: int,
                  T: int) -> np.ndarray:
    """Overlap-added squared-window envelope (torch.istft's denominator)."""
    win = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    w2 = win * win
    env = np.zeros(T, np.float64)
    for m in range(n_frames):
        env[m * hop:m * hop + n_fft] += w2
    return np.maximum(env, 1e-11).astype(np.float32)


def istft(reim: jax.Array, n_fft: int, hop_length: int, win_length: int,
          length: int, center: bool = True,
          torch_normalized: bool = False) -> jax.Array:
    """Inverse STFT (torch.istft semantics): [..., frames, 2*bins] re/im
    (concat channel order, matching stft_reim_conv) → [..., length].

    Per-frame irfft+window is one matmul against the inverse-DFT basis;
    overlap-add is the adjoint of _frame (pure shifted pad+adds via vjp —
    no scatters); the squared-window COLA envelope divides out at trace
    time as a numpy constant. Match: reference adp.py:1525-1549 (STFT.decode).
    """
    *lead, n_frames, _ = reim.shape
    basis = jnp.asarray(_idft_basis(n_fft, win_length, torch_normalized))
    frames = jax.lax.dot_general(
        reim.astype(jnp.float32), basis, (((reim.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [..., frames, n_fft]
    T_full = n_fft + (n_frames - 1) * hop_length
    zeros = jnp.zeros((*lead, T_full), jnp.float32)
    _, vjp = jax.vjp(lambda s: _frame(s, n_fft, hop_length), zeros)
    ola = vjp(frames)[0]
    ola = ola / jnp.asarray(
        _ola_envelope(n_fft, win_length, hop_length, n_frames, T_full))
    start = n_fft // 2 if center else 0
    out = jax.lax.slice_in_dim(ola, start, start + length, axis=-1)
    if out.shape[-1] < length:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1)
                      + [(0, length - out.shape[-1])])
    return out
