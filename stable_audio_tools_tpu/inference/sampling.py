"""Diffusion/flow samplers as jitted `lax.scan` loops — no host sync per step.

Capability parity with reference stable_audio_tools/inference/sampling.py and
the k-diffusion samplers it dispatches to (sample_k :331-409, sample_rf
:414-462, v-ddim sample :254-307). The reference steps a python loop that
syncs host<->device every iteration; here the full sampler (noise schedule,
CFG batch-doubling inside the model_fn, multistep history) compiles into one
XLA program.

Design:
- sigma/timestep schedules are computed in numpy at trace time (static), so
  multistep coefficients (LMS integrals, DPM orders) are compile-time
  constants.
- model_fn(x, t) -> model output (v for "v"/RF objectives). Wrappers map it
  to the denoiser the sampler family expects (k-diffusion VDenoiser).
- stochastic samplers take an explicit jax PRNG key; noise is derived with
  fold_in per step inside the scan.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def get_alphas_sigmas(t):
    """cos/sin schedule for v-diffusion (reference sampling.py:9-13)."""
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def alpha_sigma_to_t(alpha, sigma):
    return jnp.arctan2(sigma, alpha) / math.pi * 2


def t_to_alpha_sigma(t):
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def get_sigmas_polyexponential(n, sigma_min, sigma_max, rho=1.0):
    """k-diffusion polyexponential sigma schedule + trailing zero (numpy)."""
    ramp = np.linspace(1, 0, n) ** rho
    sigmas = np.exp(ramp * (math.log(sigma_max) - math.log(sigma_min)) + math.log(sigma_min))
    return np.append(sigmas, 0.0).astype(np.float32)


def get_rf_schedule(steps, sigma_max=1.0):
    """logsnr-spaced t grid for rectified flow (reference sampling.py:448-457)."""
    logsnr_max = math.log((1 - sigma_max) / sigma_max + 1e-6) if sigma_max < 1 else -6.0
    logsnr = np.linspace(logsnr_max, 2, steps + 1)
    t = 1.0 / (1.0 + np.exp(logsnr))  # sigmoid(-logsnr)
    t[0] = sigma_max
    t[-1] = 0.0
    return t.astype(np.float32)


class DistributionShift:
    """Sequence-length-dependent timestep shift (reference sampling.py:24-41)."""

    def __init__(self, base_shift=0.5, max_shift=1.15, max_length=4096, min_length=256,
                 use_sine=False):
        self.base_shift = base_shift
        self.max_shift = max_shift
        self.max_length = max_length
        self.min_length = min_length
        self.use_sine = use_sine

    def time_shift(self, t, seq_len: int):
        seq_len = min(max(seq_len, self.min_length), self.max_length)
        mu = -(
            self.base_shift
            + (self.max_shift - self.base_shift)
            * (seq_len - self.min_length)
            / (self.max_length - self.min_length)
        )
        is_np = isinstance(t, np.ndarray)
        xp = np if is_np else jnp
        with np.errstate(divide="ignore"):
            t_out = 1 - math.exp(mu) / (math.exp(mu) + (1 / (1 - t) - 1))
        if self.use_sine:
            t_out = xp.sin(t_out * math.pi / 2)
        return t_out


def sample_timesteps_logsnr(rng, batch_size, mean_logsnr=-1.2, std_logsnr=2.0):
    """Training-time timestep sampler (reference sampling.py:43-67)."""
    logsnr = jax.random.normal(rng, (batch_size,)) * std_logsnr + mean_logsnr
    t = jax.nn.sigmoid(-logsnr)
    return jnp.clip(t, 1e-4, 1 - 1e-4)


def truncated_logistic_normal_rescaled(rng, shape, left_trunc=0.075, right_trunc=1.0):
    """Training-time truncated logit-normal sampler (reference :67-98)."""
    from jax.scipy.stats import norm

    logits = jax.random.normal(rng, shape)
    cdf = norm.cdf(logits)
    lower = norm.cdf(jax.scipy.special.logit(jnp.asarray(left_trunc)))
    upper = norm.cdf(jax.scipy.special.logit(jnp.asarray(right_trunc - 1e-7)))
    truncated_cdf = lower + (upper - lower) * cdf
    samples = jax.nn.sigmoid(norm.ppf(truncated_cdf))
    return (samples - left_trunc) / (right_trunc - left_trunc)


# ---------------------------------------------------------------------------
# denoiser wrappers
# ---------------------------------------------------------------------------


def make_v_denoiser(model_fn, sigma_data: float = 1.0):
    """k-diffusion VDenoiser: v-model at t=atan(sigma)*2/pi → denoised(x, sigma)."""

    def denoiser(x, sigma, **kwargs):
        sigma = jnp.broadcast_to(sigma, (x.shape[0],))
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        c_skip = sigma_data ** 2 / (s ** 2 + sigma_data ** 2)
        c_out = -s * sigma_data / jnp.sqrt(s ** 2 + sigma_data ** 2)
        c_in = 1.0 / jnp.sqrt(s ** 2 + sigma_data ** 2)
        t = jnp.arctan(sigma) / math.pi * 2
        return model_fn(x * c_in, t, **kwargs) * c_out + x * c_skip

    return denoiser


def _to_d(x, sigma, denoised):
    return (x - denoised) / sigma


def _bcast(v, x):
    return jnp.asarray(v, x.dtype)


# ---------------------------------------------------------------------------
# v-diffusion DDIM (reference sample :254-307)
# ---------------------------------------------------------------------------


def sample(model_fn, x, steps, eta=0.0, sigma_max=1.0, dist_shift=None, cfg_pp=False,
           rng=None, **extra_args):
    """v-diffusion DDIM sampler; returns the final denoised prediction."""
    t = np.linspace(sigma_max, 0, steps + 1)[:-1].astype(np.float32)
    if dist_shift is not None:
        t = dist_shift.time_shift(t, x.shape[-1])
    alphas = np.cos(t * math.pi / 2).astype(np.float32)
    sigmas = np.sin(t * math.pi / 2).astype(np.float32)
    ts = jnp.ones((x.shape[0],), x.dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # hoisted: constants created inside a scan body compile pathologically slowly
    t_j, alphas_j, sigmas_j = jnp.asarray(t), jnp.asarray(alphas), jnp.asarray(sigmas)

    def body(carry, i):
        x, pred = carry
        t_i = t_j[i]
        alpha_i, sigma_i = alphas_j[i], sigmas_j[i]
        if cfg_pp:
            v, info = model_fn(x, ts * t_i, return_info=True, **extra_args)
            v_eps = info.get("uncond_output", v)
        else:
            v = model_fn(x, ts * t_i, **extra_args)
            v_eps = v
        pred = x * alpha_i - v * sigma_i
        eps = x * sigma_i + v_eps * alpha_i
        alpha_n = alphas_j[jnp.minimum(i + 1, steps - 1)]
        sigma_n = sigmas_j[jnp.minimum(i + 1, steps - 1)]
        ddim_sigma = eta * jnp.sqrt(sigma_n ** 2 / jnp.maximum(sigma_i ** 2, 1e-20)) * jnp.sqrt(
            jnp.clip(1 - alpha_i ** 2 / jnp.maximum(alpha_n ** 2, 1e-20), 0, None)
        )
        adjusted_sigma = jnp.sqrt(jnp.clip(sigma_n ** 2 - ddim_sigma ** 2, 0, None))
        x_next = pred * alpha_n + eps * adjusted_sigma
        if eta:
            noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
            x_next = x_next + noise * ddim_sigma
        # on the final step keep x unchanged (we return pred)
        x_next = jnp.where(i < steps - 1, x_next, x)
        return (x_next, pred), None

    (x, pred), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(steps))
    return pred


# ---------------------------------------------------------------------------
# rectified-flow samplers (reference :97-250)
# ---------------------------------------------------------------------------


def sample_discrete_euler(model_fn, x, steps=None, sigma_max=1.0, sigmas=None,
                          dist_shift=None, **extra_args):
    if sigmas is None:
        sigmas = np.linspace(sigma_max, 0, steps + 1).astype(np.float32)
        if dist_shift is not None:
            sigmas = dist_shift.time_shift(sigmas, x.shape[-1])
    t = np.asarray(sigmas, dtype=np.float32)
    ones = jnp.ones((x.shape[0],), x.dtype)
    t_j = jnp.asarray(t)

    def body(x, i):
        t_curr = t_j[i]
        t_prev = t_j[i + 1]
        dt = t_prev - t_curr
        v = model_fn(x, t_curr * ones, **extra_args)
        return x + dt * v, None

    x, _ = jax.lax.scan(body, x, jnp.arange(len(t) - 1))
    return x


def sample_rk4(model_fn, x, steps=None, sigma_max=1.0, sigmas=None, dist_shift=None,
               **extra_args):
    if sigmas is None:
        sigmas = np.linspace(sigma_max, 0, steps + 1).astype(np.float32)
        if dist_shift is not None:
            sigmas = dist_shift.time_shift(sigmas, x.shape[-1])
    t = np.asarray(sigmas, dtype=np.float32)
    ones = jnp.ones((x.shape[0],), x.dtype)
    t_j = jnp.asarray(t)

    def body(x, i):
        t_curr, t_prev = t_j[i], t_j[i + 1]
        dt = t_prev - t_curr
        k1 = model_fn(x, t_curr * ones, **extra_args)
        k2 = model_fn(x + dt / 2 * k1, (t_curr + dt / 2) * ones, **extra_args)
        k3 = model_fn(x + dt / 2 * k2, (t_curr + dt / 2) * ones, **extra_args)
        k4 = model_fn(x + dt * k3, t_prev * ones, **extra_args)
        return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None

    x, _ = jax.lax.scan(body, x, jnp.arange(len(t) - 1))
    return x


def sample_flow_dpmpp(model_fn, x, steps=None, sigma_max=1.0, sigmas=None,
                      dist_shift=None, **extra_args):
    """DPM-Solver++(2M) for rectified flow (reference :178-219)."""
    if sigmas is None:
        sigmas = np.linspace(sigma_max, 0, steps + 1).astype(np.float32)
        if dist_shift is not None:
            sigmas = dist_shift.time_shift(sigmas, x.shape[-1])
    t = np.asarray(sigmas, dtype=np.float32)
    n = len(t) - 1
    ones = jnp.ones((x.shape[0],), x.dtype)
    log_snr = lambda s: jnp.log(jnp.clip((1 - s) / jnp.clip(s, 1e-12, None), 1e-12, None))

    t_j = jnp.asarray(t)

    def body(carry, i):
        x, old_denoised = carry
        t_curr = t_j[i]
        t_next = t_j[i + 1]
        t_prev = t_j[jnp.maximum(i - 1, 0)]
        denoised = x - t_curr * model_fn(x, t_curr * ones, **extra_args)
        alpha_t = 1 - t_next
        h = log_snr(t_next) - log_snr(t_curr)
        h_last = log_snr(t_curr) - log_snr(t_prev)
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        use_first = jnp.logical_or(i == 0, t_next == 0)
        d_eff = jnp.where(use_first, denoised, denoised_d)
        x = (t_next / t_curr) * x - alpha_t * jnp.expm1(-h) * d_eff
        return (x, denoised), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(n))
    return x


def sample_flow_pingpong(model_fn, x, steps=None, sigma_max=1.0, sigmas=None,
                         dist_shift=None, rng=None, **extra_args):
    if sigmas is None:
        sigmas = np.linspace(sigma_max, 0, steps + 1).astype(np.float32)
        if dist_shift is not None:
            sigmas = dist_shift.time_shift(sigmas, x.shape[-1])
    t = np.asarray(sigmas, dtype=np.float32)
    ones = jnp.ones((x.shape[0],), x.dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    t_j = jnp.asarray(t)

    def body(x, i):
        t_curr = t_j[i]
        t_next = t_j[i + 1]
        denoised = x - t_curr * model_fn(x, t_curr * ones, **extra_args)
        noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
        return (1 - t_next) * denoised + t_next * noise, None

    x, _ = jax.lax.scan(body, x, jnp.arange(len(t) - 1))
    return x


# ---------------------------------------------------------------------------
# k-diffusion samplers over sigma schedules (denoiser = make_v_denoiser(model))
# ---------------------------------------------------------------------------


def sample_euler_k(denoiser, x, sigmas, **extra_args):
    s = jnp.asarray(sigmas)

    def body(x, i):
        denoised = denoiser(x, s[i], **extra_args)
        d = _to_d(x, s[i], denoised)
        x = x + d * (s[i + 1] - s[i])
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(len(sigmas) - 1))
    return x


def sample_heun(denoiser, x, sigmas, **extra_args):
    s = jnp.asarray(sigmas)
    n = len(sigmas) - 1

    def body(x, i):
        sigma, sigma_next = s[i], s[i + 1]
        denoised = denoiser(x, sigma, **extra_args)
        d = _to_d(x, sigma, denoised)
        dt = sigma_next - sigma
        x_euler = x + d * dt
        # 2nd-order correction (skipped on the final step where sigma_next=0)
        sigma_2 = jnp.maximum(sigma_next, 1e-8)
        denoised_2 = denoiser(x_euler, sigma_2, **extra_args)
        d_2 = _to_d(x_euler, sigma_2, denoised_2)
        x_heun = x + (d + d_2) / 2 * dt
        x = jnp.where(sigma_next == 0, x_euler, x_heun)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def sample_dpm_2(denoiser, x, sigmas, **extra_args):
    s = jnp.asarray(sigmas)
    n = len(sigmas) - 1

    def body(x, i):
        sigma, sigma_next = s[i], s[i + 1]
        denoised = denoiser(x, sigma, **extra_args)
        d = _to_d(x, sigma, denoised)
        x_euler = x + d * (sigma_next - sigma)
        sigma_mid = jnp.exp(
            jnp.log(sigma) + (jnp.log(jnp.maximum(sigma_next, 1e-8)) - jnp.log(sigma)) * 0.5
        )
        dt_1 = sigma_mid - sigma
        dt_2 = sigma_next - sigma
        x_2 = x + d * dt_1
        denoised_2 = denoiser(x_2, sigma_mid, **extra_args)
        d_2 = _to_d(x_2, sigma_mid, denoised_2)
        x_mid = x + d_2 * dt_2
        x = jnp.where(sigma_next == 0, x_euler, x_mid)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def _lms_coeffs(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """Precomputed linear-multistep coefficients (static, scipy quad)."""
    from scipy import integrate

    n = len(sigmas) - 1
    coeffs = np.zeros((n, order), dtype=np.float32)
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            def fn(tau, i=i, j=j, cur_order=cur_order):
                prod = 1.0
                for k in range(cur_order):
                    if j == k:
                        continue
                    prod *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
                return prod

            coeffs[i, j] = integrate.quad(fn, sigmas[i], sigmas[i + 1], epsrel=1e-4)[0]
    return coeffs


def sample_lms(denoiser, x, sigmas, order=4, **extra_args):
    s = jnp.asarray(sigmas)
    coeffs = jnp.asarray(_lms_coeffs(np.asarray(sigmas, np.float64), order))
    n = len(sigmas) - 1

    def body(carry, i):
        x, ds = carry  # ds: [order, ...] history of derivatives, newest first
        denoised = denoiser(x, s[i], **extra_args)
        d = _to_d(x, s[i], denoised)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        x = x + jnp.tensordot(coeffs[i], ds, axes=1)
        return (x, ds), None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(body, (x, ds0), jnp.arange(n))
    return x


def _ancestral_step(sigma_from, sigma_to, eta=1.0):
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(
            sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2)
            / jnp.maximum(sigma_from ** 2, 1e-20)
        ),
    )
    sigma_down = jnp.sqrt(jnp.clip(sigma_to ** 2 - sigma_up ** 2, 0, None))
    return sigma_down, sigma_up


def sample_dpmpp_2s_ancestral(denoiser, x, sigmas, eta=1.0, rng=None, **extra_args):
    s = jnp.asarray(sigmas)
    n = len(sigmas) - 1
    if rng is None:
        rng = jax.random.PRNGKey(0)
    t_fn = lambda sig: -jnp.log(jnp.maximum(sig, 1e-20))
    sigma_fn = lambda t: jnp.exp(-t)

    def body(x, i):
        sigma, sigma_next = s[i], s[i + 1]
        denoised = denoiser(x, sigma, **extra_args)
        sigma_down, sigma_up = _ancestral_step(sigma, sigma_next, eta)
        # euler branch (sigma_down == 0)
        d = _to_d(x, sigma, denoised)
        x_euler = x + d * (sigma_down - sigma)
        # dpm-solver++(2S) branch
        t, t_next = t_fn(sigma), t_fn(jnp.maximum(sigma_down, 1e-20))
        h = t_next - t
        s_mid = t + 0.5 * h
        x_2 = (sigma_fn(s_mid) / sigma_fn(t)) * x - jnp.expm1(-0.5 * h) * denoised
        denoised_2 = denoiser(x_2, sigma_fn(s_mid), **extra_args)
        x_2s = (sigma_fn(t_next) / sigma_fn(t)) * x - jnp.expm1(-h) * denoised_2
        x = jnp.where(sigma_down == 0, x_euler, x_2s)
        noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
        x = x + jnp.where(sigma_next > 0, noise * sigma_up, 0.0)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


def sample_dpmpp_2m(denoiser, x, sigmas, **extra_args):
    s = jnp.asarray(sigmas)
    n = len(sigmas) - 1
    t_fn = lambda sig: -jnp.log(jnp.maximum(sig, 1e-20))

    def body(carry, i):
        x, old_denoised = carry
        sigma, sigma_next = s[i], s[i + 1]
        sigma_prev = s[jnp.maximum(i - 1, 0)]
        denoised = denoiser(x, sigma, **extra_args)
        t, t_next = t_fn(sigma), t_fn(sigma_next)
        h = t_next - t
        h_last = t - t_fn(sigma_prev)
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        use_first = jnp.logical_or(i == 0, sigma_next == 0)
        d_eff = jnp.where(use_first, denoised, denoised_d)
        ratio = jnp.where(sigma_next == 0, 0.0, sigma_next / sigma)
        x = ratio * x - jnp.expm1(-h) * d_eff
        # exact: at sigma_next==0, expm1(-inf) = -1 → x = d_eff = denoised
        x = jnp.where(sigma_next == 0, d_eff, x)
        return (x, denoised), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(n))
    return x


def sample_dpmpp_2m_sde(denoiser, x, sigmas, eta=1.0, s_noise=1.0, rng=None,
                        solver_type="midpoint", **extra_args):
    s = jnp.asarray(sigmas)
    n = len(sigmas) - 1
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def body(carry, i):
        x, old_denoised, h_last = carry
        sigma, sigma_next = s[i], s[i + 1]
        denoised = denoiser(x, sigma, **extra_args)
        sn = jnp.maximum(sigma_next, 1e-20)
        t, t_next = -jnp.log(sigma), -jnp.log(sn)
        h = t_next - t
        eta_h = eta * h
        x_new = sn / sigma * jnp.exp(-eta_h) * x - jnp.expm1(-h - eta_h) * denoised
        r = h_last / h
        if solver_type == "midpoint":
            corr = 0.5 * -jnp.expm1(-h - eta_h) * (1 / r) * (denoised - old_denoised)
        else:  # heun
            corr = (
                (-jnp.expm1(-h - eta_h) / (-h - eta_h) + 1)
                * (1 / r)
                * (denoised - old_denoised)
            )
        x_new = x_new + jnp.where(i > 0, corr, 0.0)
        noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
        x_new = x_new + noise * sigma_next * jnp.sqrt(
            jnp.clip(-jnp.expm1(-2 * eta_h), 0, None)
        ) * s_noise
        x = jnp.where(sigma_next == 0, denoised, x_new)
        return (x, denoised, h), None

    (x, _, _), _ = jax.lax.scan(
        body, (x, jnp.zeros_like(x), jnp.ones(())), jnp.arange(n)
    )
    return x


def sample_dpmpp_3m_sde(denoiser, x, sigmas, eta=1.0, s_noise=1.0, rng=None, **extra_args):
    s = jnp.asarray(sigmas)
    n = len(sigmas) - 1
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def body(carry, i):
        x, d1_prev, d2_prev, h1_prev, h2_prev = carry
        sigma, sigma_next = s[i], s[i + 1]
        denoised = denoiser(x, sigma, **extra_args)
        sn = jnp.maximum(sigma_next, 1e-20)
        t, t_next = -jnp.log(sigma), -jnp.log(sn)
        h = t_next - t
        h_eta = h * (eta + 1)
        x_new = jnp.exp(-h_eta) * x - jnp.expm1(-h_eta) * denoised
        phi_2 = jnp.expm1(-h_eta) / h_eta + 1
        phi_3 = phi_2 / h_eta - 0.5
        # order-2 correction (i >= 1)
        r0 = h1_prev / h
        d1_0 = (denoised - d1_prev) / r0
        corr2 = phi_2 * d1_0
        # order-3 correction (i >= 2)
        r1 = h2_prev / h
        d1_1 = (d1_prev - d2_prev) / r1
        d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
        d2 = (d1_0 - d1_1) / (r0 + r1)
        corr3 = phi_2 * d1 - phi_3 * d2
        corr = jnp.where(i >= 2, corr3, jnp.where(i >= 1, corr2, 0.0))
        x_new = x_new + corr
        noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
        x_new = x_new + noise * sigma_next * jnp.sqrt(
            jnp.clip(-jnp.expm1(-2 * h * eta), 0, None)
        ) * s_noise
        x = jnp.where(sigma_next == 0, denoised, x_new)
        return (x, denoised, d1_prev, h, h1_prev), None

    carry0 = (x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones(()), jnp.ones(()))
    (x, _, _, _, _), _ = jax.lax.scan(body, carry0, jnp.arange(n))
    return x


# -- DPM-Solver fast / adaptive (k-diffusion DPMSolver, eps-model in t-space) --


def _dpm_eps(denoiser, x, sigma, **extra_args):
    denoised = denoiser(x, sigma, **extra_args)
    return (x - denoised) / sigma, denoised


def sample_dpm_fast(denoiser, x, sigma_min, sigma_max, n, rng=None, **extra_args):
    """DPM-Solver-fast: order-3 chunks over uniform t grid (t = -log sigma)."""
    m = n // 3 + 1
    ts = np.linspace(-math.log(sigma_max), -math.log(sigma_min), m + 1).astype(np.float64)
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [n % 3]

    sig = lambda t: math.exp(-t)

    for i, order in enumerate(orders):
        t, t_next = ts[i], ts[i + 1]
        h = t_next - t
        eps, denoised = _dpm_eps(denoiser, x, _bcast(sig(t), x), **extra_args)
        if order == 1:
            x = x - _bcast(sig(t_next) * math.expm1(h), x) * eps
        elif order == 2:
            s1 = t + h / 2
            u1 = x - _bcast(sig(s1) * math.expm1(h / 2), x) * eps
            eps_r1, _ = _dpm_eps(denoiser, u1, _bcast(sig(s1), x), **extra_args)
            x = x - _bcast(sig(t_next) * math.expm1(h), x) * eps - _bcast(
                sig(t_next) * math.expm1(h), x
            ) * (eps_r1 - eps)
        else:
            # r1=1/3, r2=2/3 (k-diffusion dpm_solver_3_step coefficients)
            s1, s2 = t + h / 3, t + 2 * h / 3
            u1 = x - _bcast(sig(s1) * math.expm1(h / 3), x) * eps
            eps_r1, _ = _dpm_eps(denoiser, u1, _bcast(sig(s1), x), **extra_args)
            u2 = (
                x
                - _bcast(sig(s2) * math.expm1(2 * h / 3), x) * eps
                - _bcast(sig(s2) * 2.0 * (math.expm1(2 * h / 3) / (2 * h / 3) - 1), x)
                * (eps_r1 - eps)
            )
            eps_r2, _ = _dpm_eps(denoiser, u2, _bcast(sig(s2), x), **extra_args)
            x = x - _bcast(sig(t_next) * math.expm1(h), x) * eps - _bcast(
                sig(t_next) * 1.5 * (math.expm1(h) / h - 1), x
            ) * (eps_r2 - eps)
    # final denoise to sigma=0
    _, denoised = _dpm_eps(denoiser, x, _bcast(sig(ts[-1]), x), **extra_args)
    return denoised


def sample_dpm_adaptive(denoiser, x, sigma_min, sigma_max, rtol=0.01, atol=0.01,
                        max_steps=100, rng=None, **extra_args):
    """Adaptive DPM-Solver-2/3 with PI step-size control, as lax.while_loop.

    The reference's k-dpm-adaptive has data-dependent step counts; here the
    loop is a bounded while_loop so it stays inside one XLA program.
    """
    t_start = -math.log(sigma_max)
    t_end = -math.log(sigma_min)

    def dpm_solver_2(x, t, t_next):
        h = t_next - t
        sig_t = jnp.exp(-t)
        sig_s1 = jnp.exp(-(t + h / 2))
        sig_next = jnp.exp(-t_next)
        eps, _ = _dpm_eps(denoiser, x, sig_t, **extra_args)
        u1 = x - sig_s1 * jnp.expm1(h / 2) * eps
        eps_r1, _ = _dpm_eps(denoiser, u1, sig_s1, **extra_args)
        x_low = x - sig_next * jnp.expm1(h) * eps  # order 1
        x_high = x_low - sig_next * jnp.expm1(h) * (eps_r1 - eps)  # order 2
        return x_low, x_high

    def cond(state):
        x, t, h, i, _ = state
        return jnp.logical_and(t < t_end - 1e-5, i < max_steps)

    def body(state):
        x, t, h, i, accept_count = state
        h = jnp.minimum(h, t_end - t)
        t_next = t + h
        x_low, x_high = dpm_solver_2(x, t, t_next)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_high)))
        error = jnp.sqrt(jnp.mean(((x_low - x_high) / delta) ** 2))
        accept = error <= 1.0
        x = jnp.where(accept, x_high, x)
        t = jnp.where(accept, t_next, t)
        h_new = 0.9 * h * jnp.clip(error, 1e-8, None) ** -0.5
        h = jnp.clip(h_new, 1e-4, t_end - t + 1e-8)
        return (x, t, h, i + 1, accept_count + accept.astype(jnp.int32))

    h0 = (t_end - t_start) / 10.0
    state = (x, jnp.asarray(t_start), jnp.asarray(h0), jnp.asarray(0), jnp.asarray(0))
    x, t, h, i, _ = jax.lax.while_loop(cond, body, state)
    _, denoised = _dpm_eps(denoiser, x, jnp.exp(-jnp.asarray(t_end)), **extra_args)
    return denoised


# ---------------------------------------------------------------------------
# dispatchers (reference sample_k :331-409, sample_rf :414-462)
# ---------------------------------------------------------------------------

K_DIFFUSION_SAMPLERS = (
    "k-heun", "k-lms", "k-dpmpp-2s-ancestral", "k-dpm-2", "k-dpm-fast",
    "k-dpm-adaptive", "dpmpp-2m-sde", "dpmpp-3m-sde", "dpmpp-2m",
)
V_SAMPLERS = ("v-ddim", "v-ddim-cfgpp")
RF_SAMPLERS = ("euler", "rk4", "dpmpp", "pingpong")


def _wrap_denoised_tap(denoiser, tap):
    """Stream (denoised, sigma) to a host callback from inside the fused
    sampler scan (preview spectrograms: reference
    interfaces/diffusion_cond.py:163-182 runs a python callback per step; here
    the scan stays one program and io_callback taps it)."""
    import jax.experimental

    def tapped(x, sigma, **kwargs):
        denoised = denoiser(x, sigma, **kwargs)
        jax.experimental.io_callback(
            tap, None, denoised, jnp.max(jnp.broadcast_to(sigma, (1,))),
            ordered=True,
        )
        return denoised

    return tapped


def sample_k(
    model_fn,
    noise,
    init_data=None,
    steps=100,
    sampler_type="dpmpp-2m-sde",
    sigma_min=0.01,
    sigma_max=100.0,
    rho=1.0,
    rng=None,
    denoised_tap=None,
    **extra_args,
):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if sampler_type in K_DIFFUSION_SAMPLERS:
        denoiser = make_v_denoiser(model_fn)
        if denoised_tap is not None:
            denoiser = _wrap_denoised_tap(denoiser, denoised_tap)
        sigmas = get_sigmas_polyexponential(steps, sigma_min, sigma_max, rho)
        noise = noise * sigmas[0]
        x = init_data + noise if init_data is not None else noise
        # Run the scan with the carry in NLC [B, N, C]: with the reference
        # [B, C, N] carry XLA picks the transpose-free-but-tile-hostile
        # {1,0,2}/T(1,128) layout (1 of 8 sublanes, C=64 of 128 lanes), so
        # every elementwise pass of the sampler body runs ~16x below HBM
        # roofline — 16.6 ms/step of a 364 ms SA-2.0 step. The swaps at
        # the denoiser boundary cancel against the model's internal
        # NCT->NLC transposes; every k-* update rule is elementwise, so
        # this is exact. (Previews keep the reference layout: the tap
        # streams [B, C, N] to host consumers.)
        nlc = x.ndim == 3 and denoised_tap is None
        if nlc:
            x = jnp.swapaxes(x, 1, 2)
            base_denoiser = denoiser

            def denoiser(xq, sigma, **kw):
                out = base_denoiser(jnp.swapaxes(xq, 1, 2), sigma, **kw)
                return jnp.swapaxes(out, 1, 2)

        if sampler_type == "k-heun":
            out = sample_heun(denoiser, x, sigmas, **extra_args)
        elif sampler_type == "k-lms":
            out = sample_lms(denoiser, x, sigmas, **extra_args)
        elif sampler_type == "k-dpmpp-2s-ancestral":
            out = sample_dpmpp_2s_ancestral(denoiser, x, sigmas, rng=rng, **extra_args)
        elif sampler_type == "k-dpm-2":
            out = sample_dpm_2(denoiser, x, sigmas, **extra_args)
        elif sampler_type == "k-dpm-fast":
            out = sample_dpm_fast(denoiser, x, sigma_min, sigma_max, steps, rng=rng,
                                  **extra_args)
        elif sampler_type == "k-dpm-adaptive":
            out = sample_dpm_adaptive(denoiser, x, sigma_min, sigma_max, rtol=0.01,
                                      atol=0.01, rng=rng, **extra_args)
        elif sampler_type == "dpmpp-2m":
            out = sample_dpmpp_2m(denoiser, x, sigmas, **extra_args)
        elif sampler_type == "dpmpp-2m-sde":
            out = sample_dpmpp_2m_sde(denoiser, x, sigmas, rng=rng, **extra_args)
        elif sampler_type == "dpmpp-3m-sde":
            out = sample_dpmpp_3m_sde(denoiser, x, sigmas, rng=rng, **extra_args)
        else:
            raise ValueError(f"Unknown sampler type {sampler_type}")
        return jnp.swapaxes(out, 1, 2) if nlc else out
    elif sampler_type in V_SAMPLERS:
        sigma_max = min(sigma_max, 1.0)
        alpha, sigma = t_to_alpha_sigma(jnp.asarray(sigma_max))
        x = init_data * alpha + noise * sigma if init_data is not None else noise
        cfg_pp = sampler_type == "v-ddim-cfgpp"
        if denoised_tap is not None:
            # v-model: denoised = alpha(t)*x - sigma(t)*v
            base_fn = model_fn

            def model_fn(x, t, **kwargs):
                out = base_fn(x, t, **kwargs)
                # cfg++ calls with return_info=True and gets (v, info) back
                v = out[0] if isinstance(out, tuple) else out
                a, s = t_to_alpha_sigma(t)
                sh = (-1,) + (1,) * (x.ndim - 1)
                import jax.experimental

                # stream the k-space sigma = tan(t*pi/2) so preview
                # consumers can use one sigma->t conversion for all
                # v-objective taps (interface/gradio.py)
                # clip below 1: f32 tan(pi/2) wraps to a huge NEGATIVE value
                t_lbl = jnp.minimum(jnp.max(t), 0.9999)
                jax.experimental.io_callback(
                    denoised_tap, None,
                    x * a.reshape(sh) - v * s.reshape(sh),
                    jnp.tan(t_lbl * (math.pi / 2)), ordered=True,
                )
                return out

        return sample(model_fn, x, steps, eta=0.0, sigma_max=sigma_max, cfg_pp=cfg_pp,
                      rng=rng, **extra_args)
    raise ValueError(f"Unknown sampler type {sampler_type}")


def sample_rf(
    model_fn,
    noise,
    init_data=None,
    steps=100,
    sampler_type="euler",
    sigma_max=1.0,
    rng=None,
    denoised_tap=None,
    **extra_args,
):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    sigma_max = min(sigma_max, 1.0)
    if init_data is not None:
        x = init_data * (1 - sigma_max) + noise * sigma_max
    else:
        x = noise
    if denoised_tap is not None:
        # rectified flow: x_t = (1-t)*x0 + t*noise, v = noise - x0
        base_fn = model_fn

        def model_fn(x, t, **kwargs):
            v = base_fn(x, t, **kwargs)
            sh = (-1,) + (1,) * (x.ndim - 1)
            tb = jnp.broadcast_to(t, (x.shape[0],))
            import jax.experimental

            jax.experimental.io_callback(
                denoised_tap, None, x - v * tb.reshape(sh),
                jnp.max(tb), ordered=True,
            )
            return v

    t = get_rf_schedule(steps, sigma_max)
    if sampler_type == "euler":
        return sample_discrete_euler(model_fn, x, sigmas=t, sigma_max=sigma_max,
                                     **extra_args)
    elif sampler_type == "rk4":
        return sample_rk4(model_fn, x, steps=steps, sigma_max=sigma_max, **extra_args)
    elif sampler_type == "dpmpp":
        return sample_flow_dpmpp(model_fn, x, sigmas=t, sigma_max=sigma_max, **extra_args)
    elif sampler_type == "pingpong":
        return sample_flow_pingpong(model_fn, x, sigmas=t, sigma_max=sigma_max, rng=rng,
                                    **extra_args)
    raise ValueError(f"Unknown sampler_type: {sampler_type}")


def get_bmask(i, steps, mask):
    """Soft-mask inpainting binarization (reference :311-315)."""
    strength = (i + 1) / steps
    return jnp.where(mask <= strength, 1.0, 0.0)
