"""ops/stft golden parity vs torch.stft (the reference's STFT frontend).

The reference's auraloss and EnCodec/DAC discriminators all frame audio with
torch.stft(center=True, periodic hann). Our XLA stft must match it exactly
for loss/discriminator parity (SURVEY §7 hard-part #1).
"""

import numpy as np
import pytest
import torch

import jax
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


@pytest.mark.parametrize("n_fft,hop,win,center", [
    (2048, 512, 2048, True),
    (1024, 256, 1024, False),
    (512, 128, 512, True),
    (32, 8, 32, True),
    (1024, 256, 600, True),
])
def test_stft_reim_conv_matches_fft(n_fft, hop, win, center):
    """The conv-DFT STFT (one strided MXU conv; used by the STFT losses and
    the MS-STFT/MRD discriminator front-ends) must reproduce the rfft path
    exactly (reference framing: stable_audio_tools/training/losses/auraloss.py
    STFT + encodec.py discriminator STFT)."""
    from stable_audio_tools_tpu.ops.stft import stft_reim_conv

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 4096).astype(np.float32))
    s = np.asarray(stft(x, n_fft, hop, win, center=center))
    reim = np.asarray(stft_reim_conv(x, n_fft, hop, win, center=center))
    bins = n_fft // 2 + 1
    assert reim.shape == (*s.shape[:-1], 2 * bins)
    scale = np.abs(s).max()
    np.testing.assert_allclose(reim[..., :bins], s.real, atol=3e-5 * scale)
    np.testing.assert_allclose(reim[..., bins:], s.imag, atol=3e-5 * scale)
    # interleaved channel order and kernel-baked normalization
    ri = np.asarray(
        stft_reim_conv(x, n_fft, hop, win, center=center, interleave=True)
    ).reshape(*s.shape, 2)
    np.testing.assert_allclose(ri[..., 0], s.real, atol=3e-5 * scale)
    np.testing.assert_allclose(ri[..., 1], s.imag, atol=3e-5 * scale)
    w = hann_window(win)
    if win < n_fft:
        p = (n_fft - win) // 2
        w = np.pad(w, (p, n_fft - win - p))
    ns = np.asarray(
        stft_reim_conv(x, n_fft, hop, win, center=center, normalized=True)
    )
    np.testing.assert_allclose(
        ns * np.sqrt((w ** 2).sum()), reim, rtol=1e-4, atol=3e-5 * scale
    )


def test_apply_fir_folded_matches_depthwise():
    """apply_fir's folded [kw,128,128] Toeplitz form must equal the naive
    depthwise FIR (torch F.conv1d semantics, auraloss FIRFilter)."""
    from stable_audio_tools_tpu.ops.stft import a_weighting_fir, apply_fir

    taps = a_weighting_fir(101, 44100)

    def naive(x, taps):
        orig_2d = x.ndim == 2
        if orig_2d:
            x = x[:, None, :]
        B, C, T = x.shape
        xl = jnp.swapaxes(x, 1, 2)
        k = jnp.tile(jnp.asarray(taps)[:, None, None], (1, 1, C)).astype(x.dtype)
        pad = len(taps) // 2
        out = jax.lax.conv_general_dilated(
            xl, k, window_strides=(1,),
            padding=[(pad, len(taps) - 1 - pad)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
        )
        out = jnp.swapaxes(out, 1, 2)
        return out[:, 0] if orig_2d else out

    rng = np.random.RandomState(4)
    for shape in [(2, 4000), (2, 3, 4096), (1, 1, 100)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(apply_fir(x, taps)), np.asarray(naive(x, taps)),
            atol=2e-5,
        )
    # asymmetric (non-linear-phase) taps exercise the correlation orientation
    taps2 = np.concatenate([a_weighting_fir(101, 44100)[:60],
                            np.zeros(11, np.float32)])
    x = jnp.asarray(rng.randn(2, 515).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(apply_fir(x, taps2)), np.asarray(naive(x, taps2)),
        atol=2e-5,
    )


def test_istft_matches_torch():
    """ops/stft.py::istft vs torch.istft (torch-normalized and not), plus
    exact roundtrip through stft_reim_conv — the ADP spectral path's
    inverse (reference adp.py:1525-1549)."""
    import torch

    from stable_audio_tools_tpu.ops.stft import istft, stft_reim_conv

    for n_fft, hop, wl, norm in [(1023, 256, 1023, True),
                                 (512, 128, 512, False),
                                 (1024, 256, 512, True)]:
        T = 4096
        x = np.random.RandomState(0).randn(3, T).astype(np.float32)
        win = torch.hann_window(wl)
        st = torch.stft(torch.tensor(x), n_fft=n_fft, hop_length=hop,
                        win_length=wl, window=win, return_complex=True,
                        normalized=norm, center=True)
        bins = n_fft // 2 + 1
        tre = st.real.numpy().transpose(0, 2, 1)
        tim = st.imag.numpy().transpose(0, 2, 1)
        yt = torch.istft(st, n_fft=n_fft, hop_length=hop, win_length=wl,
                         window=win, normalized=norm, center=True,
                         length=T).numpy()
        yo = np.asarray(istft(jnp.asarray(np.concatenate([tre, tim], -1)),
                              n_fft, hop, wl, length=T, center=True,
                              torch_normalized=norm))
        np.testing.assert_allclose(yo, yt, atol=5e-6)
        # roundtrip through our own forward
        ours = stft_reim_conv(jnp.asarray(x), n_fft, hop, wl, center=True)
        scale = n_fft ** -0.5 if norm else 1.0
        back = np.asarray(istft(ours * scale, n_fft, hop, wl, length=T,
                                center=True, torch_normalized=norm))
        np.testing.assert_allclose(back, x, atol=5e-5)
