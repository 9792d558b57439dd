"""ops/stft golden parity vs torch.stft (the reference's STFT frontend).

The reference's auraloss and EnCodec/DAC discriminators all frame audio with
torch.stft(center=True, periodic hann). Our XLA stft must match it exactly
for loss/discriminator parity (SURVEY §7 hard-part #1).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stable_audio_tools_tpu.ops.stft import hann_window, stft


@pytest.mark.parametrize("n_fft,hop,win", [
    (1024, 256, 1024),
    (512, 128, 512),
    (1024, 120, 600),   # win < n_fft (auraloss MRSTFT resolutions)
    (256, 64, 240),
    (128, 32, 128),
])
def test_stft_matches_torch(n_fft, hop, win):
    rng = np.random.RandomState(0)
    x = rng.randn(3, 4096).astype(np.float32) * 0.5

    got = np.asarray(stft(jnp.asarray(x), n_fft, hop, win))

    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=True, return_complex=True,
        pad_mode="reflect",
    ).numpy()  # [B, bins, frames]
    ref = np.swapaxes(ref, -1, -2)  # ours is [B, frames, bins]

    assert got.shape == ref.shape
    np.testing.assert_allclose(got.real, ref.real, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(got.imag, ref.imag, rtol=1e-4, atol=2e-4)


def test_hann_window_matches_torch():
    for n in (64, 255, 1024):
        np.testing.assert_allclose(
            hann_window(n), torch.hann_window(n).numpy(), rtol=1e-6, atol=1e-6
        )


def test_stft_uncentered_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 2048).astype(np.float32)
    got = np.asarray(stft(jnp.asarray(x), 512, 128, 512, center=False))
    ref = torch.stft(
        torch.from_numpy(x), 512, hop_length=128, win_length=512,
        window=torch.hann_window(512), center=False, return_complex=True,
    ).numpy()
    ref = np.swapaxes(ref, -1, -2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got.real, ref.real, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(got.imag, ref.imag, rtol=1e-4, atol=2e-4)
