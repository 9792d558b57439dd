"""In-repo P.862 wideband PESQ: scale behavior + AE validation wiring.

No conformance vectors ship in this image (the `pesq` wheel is absent), so
these tests pin the properties any PESQ must have: perfect reconstruction
scores at the top of the scale, additive noise degrades the score
monotonically, and the metric is finite through the AE validation path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.training.losses.pesq import pesq_wb_np


def _speechlike(n, seed=0, fs=16000):
    """Modulated multi-tone with pauses — enough structure for the model."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / fs
    x = np.zeros(n)
    for f0 in (220.0, 440.0, 880.0, 1760.0):
        x += rng.uniform(0.3, 1.0) * np.sin(
            2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))  # syllabic modulation
    x *= env
    x[: n // 8] = 0.0  # leading silence
    return (x / np.max(np.abs(x))).astype(np.float64)


def test_identity_scores_max():
    x = _speechlike(16000 * 2)
    mos = pesq_wb_np(x, x.copy())
    assert mos > 4.3, mos


def test_monotonic_with_noise():
    x = _speechlike(16000 * 2)
    rng = np.random.RandomState(1)
    noise = rng.randn(x.shape[0])
    scores = []
    for snr_db in (40.0, 20.0, 10.0, 0.0):
        g = np.sqrt(np.mean(x ** 2) / (10 ** (snr_db / 10) * np.mean(noise ** 2)))
        scores.append(pesq_wb_np(x, x + g * noise))
    assert all(np.isfinite(scores))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.5, scores    # 40 dB SNR is near-transparent
    assert scores[-1] < 2.5, scores   # 0 dB SNR is bad


def test_crude_align_recovers_delay():
    x = _speechlike(16000 * 2, seed=3)
    d = 800  # 50 ms
    delayed = np.concatenate([np.zeros(d), x])[: x.shape[0]]
    aligned = pesq_wb_np(x, delayed, align=True)
    unaligned = pesq_wb_np(x, delayed, align=False)
    assert aligned > unaligned
    assert aligned > 3.5, (aligned, unaligned)


def test_level_invariance():
    x = _speechlike(16000 * 2, seed=5)
    a = pesq_wb_np(x, x * 0.25)
    assert a > 4.0, a  # level alignment should make pure gain ~transparent


def test_pesq_metric_backend_and_batch():
    from stable_audio_tools_tpu.training.losses.metrics import PESQMetric

    m = PESQMetric(sample_rate=16000)
    assert m.backend in ("pesq-itu", "in-repo-p862")
    x = _speechlike(16000, seed=7)[None, None, :]  # [B=1, C=1, T]
    out = m(np.repeat(x, 2, axis=0), np.repeat(x, 2, axis=0))
    assert np.isfinite(out) and out > 4.0


@pytest.mark.slow
def test_ae_validation_logs_finite_pesq():
    """AE val step with a pesq eval loss returns a finite val/pesq."""
    from tests.test_ae_training import AE_TRAIN_CONFIG

    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config)

    model = create_model_from_config(AE_TRAIN_CONFIG)
    trainer = create_training_wrapper_from_config(AE_TRAIN_CONFIG, model)
    sr = AE_TRAIN_CONFIG["sample_rate"]
    reals = jnp.asarray(_speechlike(4096, seed=9)[None, None, :]
                        .repeat(2, axis=1).astype(np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), reals)
    val_step = trainer.make_val_step({"pesq": {}, "sisdr": {}})
    out = val_step(state, reals, jax.random.PRNGKey(1))
    assert "val/pesq" in out
    assert np.isfinite(float(out["val/pesq"])), out
