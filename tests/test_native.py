"""Native C++ data-path kernels vs numpy/scipy references."""

import numpy as np
import pytest

from stable_audio_tools_tpu.data import native
from stable_audio_tools_tpu.data.utils import measure_loudness_lufs


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no compiler)")
    return True


def test_decode_pcm16(lib_ok):
    x = (np.random.RandomState(0).randn(1000) * 8000).astype(np.int16)
    out = native.decode_pcm16(x.tobytes())
    np.testing.assert_allclose(out, x.astype(np.float32) / 32768.0, atol=1e-7)


def test_resample_poly_matches_scipy(lib_ok):
    from scipy import signal as sps

    rng = np.random.RandomState(1)
    x = rng.randn(4410).astype(np.float32)
    up, down = 160, 441  # 44100 -> 16000
    # design the same filter scipy would use
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    taps = sps.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    ref = sps.resample_poly(x, up, down, window=taps)
    out = native.resample_poly_native(x, up, down, taps.astype(np.float32))
    n = min(len(ref), len(out))
    np.testing.assert_allclose(out[:n], ref[:n], rtol=1e-3, atol=1e-4)


def test_lufs_matches_python(lib_ok):
    sr = 16000
    t = np.arange(sr) / sr
    sine = (0.1 * np.sin(2 * np.pi * 440 * t))[None].astype(np.float32)
    native_val = native.lufs_integrated(sine, sr)
    py_val = measure_loudness_lufs(sine, sr)
    assert abs(native_val - py_val) < 0.1, (native_val, py_val)
