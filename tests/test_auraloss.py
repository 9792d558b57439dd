"""STFT-loss family: fused (stacked-batch) paths match unfused math exactly.

The auraloss equivalents run one FFT batch over stacked signals
(input+target in STFTLoss, sum+diff in SumAndDifferenceSTFTLoss) — these
tests pin that rewrite to the per-signal computation. Reference semantics:
stable_audio_tools/training/losses/auraloss.py:226-601.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.training.losses.auraloss import (
    MultiResolutionSTFTLoss,
    STFTLoss,
    SumAndDifferenceSTFTLoss,
)
from stable_audio_tools_tpu.ops.stft import apply_fir


def _rand(shape, seed=0, scale=0.3):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape) * scale,
                       jnp.float32)


@pytest.mark.parametrize("perceptual", [False, True])
@pytest.mark.parametrize("scale_inv", [False, True])
def test_stft_loss_stacked_matches_per_signal(perceptual, scale_inv):
    loss = STFTLoss(fft_size=256, hop_size=64, win_length=256,
                    w_sc=1.0, w_log_mag=1.0, w_lin_mag=0.5,
                    sample_rate=16000, perceptual_weighting=perceptual,
                    scale_invariance=scale_inv)
    x = _rand((3, 2, 1024), 0)
    y = _rand((3, 2, 1024), 1)

    got = loss(x, y)

    # unfused reference: independent FIR + mag per signal
    def mag(v):
        if perceptual:
            v = apply_fir(v, loss._aw_taps)
        return loss._mag(v)

    x_mag, y_mag = mag(x), mag(y)
    if scale_inv:
        alpha = jnp.sum(x_mag * y_mag, axis=(-2, -1), keepdims=True) / (
            jnp.sum(y_mag ** 2, axis=(-2, -1), keepdims=True) + loss.eps)
        y_mag = y_mag * alpha
    want = (loss.w_sc * loss.sc(x_mag, y_mag)
            + loss.w_log_mag * loss.logmag(x_mag, y_mag)
            + loss.w_lin_mag * loss.linmag(x_mag, y_mag))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_stft_loss_stacked_matches_per_signal_2d_input():
    loss = STFTLoss(fft_size=128, hop_size=32, win_length=128)
    x, y = _rand((4, 512), 2), _rand((4, 512), 3)
    got = loss(x, y)
    want = (loss.sc(loss._mag(x), loss._mag(y))
            + loss.logmag(loss._mag(x), loss._mag(y)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("fft,hop,T", [
    (32, 8, 1024),    # k=15, frames=129: non-dividing tail (129 % 15 != 0)
    (32, 8, 952),     # frames=120: divides evenly (mask is None)
    (64, 16, 1000),   # k=7, frames with partially-real tail frames
    (128, 32, 700),   # k=3
])
def test_stft_loss_framepacked_matches_plain(fft, hop, T):
    # the lane-packing rewrite must be numerically exact incl. the invalid
    # tail frames that partially overlap real signal
    loss = STFTLoss(fft_size=fft, hop_size=hop, win_length=fft,
                    w_sc=1.0, w_log_mag=1.0, w_lin_mag=0.5)
    x, y = _rand((2, 2, T), 4), _rand((2, 2, T), 5)
    got = loss(x, y)
    x_mag, y_mag = loss._mag(x), loss._mag(y)
    want = (loss.sc(x_mag, y_mag) + loss.logmag(x_mag, y_mag)
            + 0.5 * loss.linmag(x_mag, y_mag))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_sum_and_difference_stacked_matches_full_path():
    """output='loss' (stacked sum/diff batch) == output='full' (two calls)."""
    kwargs = dict(fft_sizes=(256, 128), hop_sizes=(64, 32),
                  win_lengths=(256, 128), sample_rate=16000,
                  perceptual_weighting=True)
    fused = SumAndDifferenceSTFTLoss(**kwargs)
    unfused = SumAndDifferenceSTFTLoss(output="full", **kwargs)
    x = _rand((2, 2, 2048), 4)
    y = _rand((2, 2, 2048), 5)
    got = fused(x, y)
    want, _, _ = unfused(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_sum_and_difference_grads_match_full_path():
    kwargs = dict(fft_sizes=(128,), hop_sizes=(32,), win_lengths=(128,))
    fused = SumAndDifferenceSTFTLoss(**kwargs)
    unfused = SumAndDifferenceSTFTLoss(output="full", **kwargs)
    x = _rand((2, 2, 512), 6)
    y = _rand((2, 2, 512), 7)
    g_fused = jax.grad(lambda v: fused(v, y))(x)
    g_unfused = jax.grad(lambda v: unfused(v, y)[0])(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_unfused),
                               rtol=1e-5, atol=1e-6)


def test_mrstft_hoisted_fir_matches_per_resolution_fir():
    """MR-level A-weighting (applied once) == per-resolution STFTLoss FIR."""
    sizes = dict(fft_sizes=(256, 128), hop_sizes=(64, 32),
                 win_lengths=(256, 128))
    mr = MultiResolutionSTFTLoss(sample_rate=16000,
                                 perceptual_weighting=True, **sizes)
    x, y = _rand((2, 1024), 10), _rand((2, 1024), 11)
    got = mr(x, y)
    want = sum(
        STFTLoss(f, h, w, sample_rate=16000, perceptual_weighting=True)(x, y)
        for f, h, w in zip(sizes["fft_sizes"], sizes["hop_sizes"],
                           sizes["win_lengths"])
    ) / 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mel_loss_stacked_matches_per_signal():
    from stable_audio_tools_tpu.ops.stft import spectrogram
    from stable_audio_tools_tpu.training.losses.semantic import (
        MelSpectrogramLoss)

    loss = MelSpectrogramLoss(sample_rate=16000, n_mels=(40, 20),
                              window_lengths=(512, 128))
    x = _rand((2, 2, 2048), 12)
    y = _rand((2, 2, 2048), 13)
    got = loss(x, y)

    xf = x.reshape(-1, x.shape[-1])
    yf = y.reshape(-1, y.shape[-1])
    want = 0.0
    for w, fb in zip(loss.window_lengths, loss.fbs):
        xs = spectrogram(xf, w, w // 4, w) @ fb.T
        ys = spectrogram(yf, w, w // 4, w) @ fb.T
        xl = jnp.log10(jnp.clip(xs, loss.clamp_eps, None) ** loss.pow)
        yl = jnp.log10(jnp.clip(ys, loss.clamp_eps, None) ** loss.pow)
        want = want + jnp.mean(jnp.abs(xl - yl)) + jnp.mean(jnp.abs(xs - ys))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mrstft_scalar_and_finite():
    loss = MultiResolutionSTFTLoss(fft_sizes=(256, 128), hop_sizes=(64, 32),
                                   win_lengths=(256, 128))
    v = loss(_rand((2, 1024), 8), _rand((2, 1024), 9))
    assert v.shape == () and bool(jnp.isfinite(v))
