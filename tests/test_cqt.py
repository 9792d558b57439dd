"""True-CQT transform + BigVGAN CQT discriminator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.ops.cqt import cqt


def test_cqt_peak_bins_match_theory():
    """A pure sine's CQT magnitude must peak at bin log2(f/fmin)*bpo across
    octaves (exercises the decimation chain end-to-end)."""
    sr, hop = 16000, 256
    t = np.arange(sr) / sr
    for f in (110.0, 440.0, 1760.0, 3520.0):
        x = jnp.asarray(np.sin(2 * np.pi * f * t, dtype=np.float32))[None]
        C = cqt(x, sr, hop, fmin=32.7, n_octaves=7, bins_per_octave=24)
        mag = np.abs(np.asarray(C))[0].mean(0)
        peak = int(mag.argmax())
        expected = round(np.log2(f / 32.7) * 24)
        assert abs(peak - expected) <= 1, (f, peak, expected)
    assert C.shape == (1, sr // hop, 7 * 24)


def test_cqt_linear():
    sr, hop = 16000, 512
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(1, 4096).astype(np.float32))
    b = jnp.asarray(rs.randn(1, 4096).astype(np.float32))
    Ca = cqt(a, sr, hop, n_octaves=5, bins_per_octave=12)
    Cb = cqt(b, sr, hop, n_octaves=5, bins_per_octave=12)
    Cab = cqt(a + 2 * b, sr, hop, n_octaves=5, bins_per_octave=12)
    np.testing.assert_allclose(np.asarray(Cab), np.asarray(Ca + 2 * Cb),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bigvgan_cqt_discriminator_loss_and_grads():
    from stable_audio_tools_tpu.models.discriminators import (
        MultiScaleSubbandCQTDiscriminator,
    )

    disc = MultiScaleSubbandCQTDiscriminator(
        sample_rate=16000, channels=1, filters=4,
        hop_lengths=(256, 128), n_octaves=(5, 5), bins_per_octaves=(12, 16),
    )
    rs = np.random.RandomState(1)
    reals = jnp.asarray(rs.randn(2, 1, 4096).astype(np.float32) * 0.1)
    fakes = jnp.asarray(rs.randn(2, 1, 4096).astype(np.float32) * 0.1)
    variables = disc.init(jax.random.PRNGKey(0), reals)

    def d_loss(v):
        d, a, fm = disc.apply(v, reals, fakes, method=disc.loss)
        return d + a + fm

    loss, grads = jax.value_and_grad(d_loss)(variables)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
