"""Sampler tests on analytic score models.

For a delta data distribution at x0:
- ideal v-model: v(x, t) = (cos(tπ/2)·x − x0)/sin(tπ/2)  → all v/k samplers
  must converge to x0.
- ideal RF model: v(x, t) = (x − x0)/t → all RF samplers converge to x0.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.inference import sampling as S

X0 = np.array([[0.7, -1.3, 0.2, 2.0]], dtype=np.float32)


def ideal_v_model(x, t, **kwargs):
    x0 = jnp.asarray(X0)
    alpha = jnp.cos(t * math.pi / 2).reshape(-1, 1)
    sigma = jnp.sin(t * math.pi / 2).reshape(-1, 1)
    return (alpha * x - x0) / jnp.maximum(sigma, 1e-8)


def ideal_rf_model(x, t, **kwargs):
    x0 = jnp.asarray(X0)
    t = t.reshape(-1, 1)
    return (x - x0) / jnp.maximum(t, 1e-8)


NOISE = jnp.asarray(np.random.RandomState(0).randn(1, 4).astype(np.float32))


@pytest.mark.parametrize("sampler", [
    "k-heun", "k-lms", "k-dpmpp-2s-ancestral", "k-dpm-2", "k-dpm-fast",
    "k-dpm-adaptive", "dpmpp-2m", "dpmpp-2m-sde", "dpmpp-3m-sde",
    "v-ddim",
])
def test_k_samplers_converge_to_x0(sampler):
    steps = 50
    out = S.sample_k(
        ideal_v_model, NOISE, steps=steps, sampler_type=sampler,
        sigma_min=0.01, sigma_max=50.0, rho=1.0, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=0.05)


@pytest.mark.parametrize("sampler", ["euler", "rk4", "dpmpp", "pingpong"])
def test_rf_samplers_converge_to_x0(sampler):
    out = S.sample_rf(
        ideal_rf_model, NOISE, steps=50, sampler_type=sampler,
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(out), X0, atol=0.05)


def test_samplers_are_jittable():
    f = jax.jit(lambda n: S.sample_k(
        ideal_v_model, n, steps=10, sampler_type="dpmpp-2m-sde",
        sigma_min=0.3, sigma_max=50.0,
    ))
    out = f(NOISE)
    assert np.all(np.isfinite(np.asarray(out)))

    g = jax.jit(lambda n: S.sample_rf(ideal_rf_model, n, steps=10, sampler_type="euler"))
    assert np.all(np.isfinite(np.asarray(g(NOISE))))


def test_polyexponential_sigmas_match_kdiffusion_formula():
    sig = S.get_sigmas_polyexponential(10, 0.01, 100.0, rho=1.0)
    assert sig.shape == (11,)
    assert sig[-1] == 0.0
    assert abs(sig[0] - 100.0) < 1e-3
    assert abs(sig[-2] - 0.01) < 1e-5
    # rho=1: log-linear
    logs = np.log(sig[:-1])
    diffs = np.diff(logs)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-4)


def test_rf_schedule_endpoints():
    t = S.get_rf_schedule(20, sigma_max=1.0)
    assert t[0] == 1.0 and t[-1] == 0.0
    assert np.all(np.diff(t) < 0)


def test_distribution_shift_monotonic():
    ds = S.DistributionShift()
    t = np.linspace(0.01, 0.99, 32).astype(np.float32)
    shifted_short = ds.time_shift(t, 256)
    shifted_long = ds.time_shift(t, 4096)
    assert np.all(np.diff(shifted_short) > 0)
    # longer sequences shift timesteps toward noisier side
    assert np.mean(shifted_long) > np.mean(shifted_short)


def test_variation_init_data():
    """init_data biases the result (variation mode)."""
    init = jnp.asarray(X0) * 0.0 + 1.0
    out = S.sample_k(
        ideal_v_model, NOISE, init_data=init, steps=25, sampler_type="dpmpp-2m",
        sigma_min=0.01, sigma_max=1.0,
    )
    # ideal model still pulls to X0 regardless of init; just check finite + shape
    assert out.shape == X0.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_timestep_samplers():
    t1 = S.sample_timesteps_logsnr(jax.random.PRNGKey(0), 1000)
    assert t1.shape == (1000,)
    assert float(t1.min()) >= 1e-4 and float(t1.max()) <= 1 - 1e-4
    t2 = S.truncated_logistic_normal_rescaled(jax.random.PRNGKey(1), (1000,))
    assert float(t2.min()) >= 0.0 and float(t2.max()) <= 1.0


def test_v_ddim_with_eta():
    out = S.sample(ideal_v_model, NOISE, steps=50, eta=0.5, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out), X0, atol=0.1)


def test_k_dpm_adaptive_matches_dense_reference_on_gaussian():
    """Validate the adaptive sampler's trajectories on a NON-toy model: an
    anisotropic Gaussian data distribution (state-dependent analytic
    denoiser). Both the PI-controlled adaptive solver and a converged
    500-step dpmpp-2m solve the same probability-flow ODE from the same
    noise, so their endpoints must agree."""
    mu = np.array([[0.5, -1.0, 2.0, 0.0]], np.float32)
    s2 = np.array([[0.2, 1.0, 3.0, 0.05]], np.float32)  # per-dim variance

    def gaussian_v_model(x, t, **kwargs):
        alpha = jnp.cos(t * math.pi / 2).reshape(-1, 1)
        sigma = jnp.sin(t * math.pi / 2).reshape(-1, 1)
        # posterior mean E[x0|x_t] for x0 ~ N(mu, diag(s2))
        m = jnp.asarray(mu)
        v = jnp.asarray(s2)
        x0_hat = m + alpha * v * (x - alpha * m) / (alpha ** 2 * v + sigma ** 2)
        return (alpha * x - x0_hat) / jnp.maximum(sigma, 1e-8)

    noise = jnp.asarray(np.random.RandomState(3).randn(4, 4).astype(np.float32))
    ref = S.sample_k(
        gaussian_v_model, noise, steps=500, sampler_type="dpmpp-2m",
        sigma_min=0.01, sigma_max=80.0, rho=1.0, rng=jax.random.PRNGKey(0),
    )
    ada = S.sample_k(
        gaussian_v_model, noise, steps=50, sampler_type="k-dpm-adaptive",
        sigma_min=0.01, sigma_max=80.0, rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(ada), np.asarray(ref),
                               rtol=0.02, atol=0.02)


def test_v_ddim_denoised_tap_batch2_and_cfgpp():
    """Preview taps on the v-ddim family must handle batch > 1 and the
    cfg++ (return_info) calling convention (regression: broadcast_to(t,(1,))
    crashed for [B]-shaped t; the tuple return broke the tap arithmetic)."""
    from stable_audio_tools_tpu.inference.sampling import sample_k

    frames = []

    def tap(denoised, sigma):
        frames.append((np.asarray(denoised).shape, float(sigma)))

    def model_fn(x, t, **kwargs):
        v = -0.1 * x
        if kwargs.get("return_info"):
            return v, {"cond_output": v}
        return v

    noise = jnp.asarray(np.random.RandomState(0).randn(2, 1, 32), jnp.float32)
    for st in ("v-ddim", "v-ddim-cfgpp"):
        frames.clear()
        out = sample_k(model_fn, noise, steps=3, sampler_type=st,
                       rng=jax.random.PRNGKey(0), denoised_tap=tap)
        jax.block_until_ready(out)
        assert out.shape == noise.shape
        assert np.all(np.isfinite(np.asarray(out)))
        assert len(frames) >= 3
        assert all(s == (2, 1, 32) for s, _ in frames)
        # k-space sigmas: positive, decreasing over the trajectory
        sigs = [s for _, s in frames]
        assert sigs[0] > sigs[-1] >= 0.0
