"""Activations (NLC layout).

SnakeBeta matches reference stable_audio_tools/models/blocks.py:290-328:
    snake_beta(x, a, b) = x + (1/(b + 1e-9)) * sin(a*x)^2
with per-channel alpha/beta, optionally parameterized in log scale
(exp applied at call time; logscale params init to 0 → alpha=beta=1).

The anti-aliased variant (`Activation1d` from alias-free-torch, used by DAC
decoders; reference autoencoders.py:43-46) is implemented as a polyphase
up-2x → activation → down-2x around a Kaiser-windowed sinc filter.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn



# Even minimax polynomial for cos(w), w in [-pi, pi], in u = (w/pi)^2.
# Least-squares Chebyshev-grid fit, max abs error 4.0e-10 — f32-exact.
_COS_POLY = (
    0.99999999991936261, -4.9348021895548309, 4.058711882144455,
    -1.3352607095015809, 0.23532212914803982, -0.025787854948077487,
    0.0019059121939849445, -8.9169804974573977e-05,
)


# d/dv of _COS_POLY (for the analytic backward below)
_DCOS_POLY = tuple((i + 1) * c for i, c in enumerate(_COS_POLY[1:]))


def _horner(coefs, v):
    c = jnp.float32(coefs[-1])
    for coef in coefs[-2::-1]:
        c = c * v + jnp.float32(coef)
    return c


def _sin2_reduce(z):
    """Period-pi range reduction for sin^2: z -> (t, v) with t = frac(z/pi)-1/2
    in [-1/2, 1/2) and v = (2t)^2; sin^2(z) = (1 + cos(pi*2t))/2."""
    u = z * jnp.float32(1.0 / math.pi)
    t = u - jnp.floor(u) - jnp.float32(0.5)
    v = (t * t) * jnp.float32(4.0)
    return t, v


def sin2_fast(z: jax.Array) -> jax.Array:
    """sin^2(z) in f32 via period-pi range reduction + an even cos poly.

    TPUs have no transcendental SFU: XLA's `sin` costs ~40 VPU ops/element
    with full range reduction, and the snake stacks evaluate it over
    full-audio-rate tensors (the dominant VAE-decode cost: 4.25 -> 1.64 ms
    per [1M,128] activation, measured). sin^2 has period pi, so one
    floor-based reduction suffices: with u = z/pi, t = frac(u) - 1/2,
    sin^2(z) = (1 + cos(2*pi*t))/2 and cos is evaluated by _COS_POLY
    (max error 4e-10; derivative is continuous across period boundaries
    since d cos(w)/dw = 0 at w = +-pi, so autodiff through this is a
    faithful, equally cheap sin(2z) approximation). Phase error from the
    f32 reduction stays below 1e-5 for |z| < 1e3 — far beyond the range
    of audio activations."""
    t, v = _sin2_reduce(z)
    return (jnp.float32(1.0) + _horner(_COS_POLY, v)) * jnp.float32(0.5)


def _sin2_and_dz(z):
    """(sin^2(z), d sin^2/dz) from one shared reduction: the derivative is
    0.5 * c'(v) * dv/dz = (4/pi) * t * c'(v) — same cost class as the value."""
    t, v = _sin2_reduce(z)
    s2 = (jnp.float32(1.0) + _horner(_COS_POLY, v)) * jnp.float32(0.5)
    ds2 = jnp.float32(4.0 / math.pi) * t * _horner(_DCOS_POLY, v)
    return s2, ds2


@jax.custom_vjp
def _snake_fast(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """snake_beta on the fast-sin2 path with an analytic VJP.

    Plain autodiff through the Horner chain materializes several f32
    residual tensors per activation (t, c'(v) products, ...) at full audio
    rate — measured 62 ms/pair of the SA-2.0 VAE GAN step, the single
    largest non-conv cost. The custom VJP saves only (x, alpha, beta) and
    recomputes the polynomial in backward: one fused elementwise pass each
    way, zero extra HBM residuals."""
    xf = x.astype(jnp.float32)
    s2 = sin2_fast(xf * alpha.astype(jnp.float32))
    out = xf + (1.0 / (beta.astype(jnp.float32) + 1e-9)) * s2
    return out.astype(x.dtype)


def _snake_fast_fwd(x, alpha, beta):
    return _snake_fast(x, alpha, beta), (x, alpha, beta)


def _snake_fast_bwd(res, g):
    x, alpha, beta = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    binv = 1.0 / (beta.astype(jnp.float32) + 1e-9)
    s2, ds2 = _sin2_and_dz(xf * a)
    dx = gf * (1.0 + (a * binv) * ds2)
    red = tuple(range(gf.ndim - 1))
    dalpha = jnp.sum(gf * xf * binv * ds2, axis=red)
    dbeta = jnp.sum(-gf * s2 * (binv * binv), axis=red)
    return (dx.astype(x.dtype), dalpha.astype(alpha.dtype),
            dbeta.astype(beta.dtype))


_snake_fast.defvjp(_snake_fast_fwd, _snake_fast_bwd)


def use_fast_sin2() -> bool:
    """Fast snake on TPU unless SAT_EXACT_SNAKE=1 (CPU keeps jnp.sin so
    golden parity tests against torch see libm-exact values)."""
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("SAT_EXACT_SNAKE", "0") != "1")


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """x: [..., C]; alpha/beta: [C]."""
    if use_fast_sin2():
        from .kernels.snake import snake_fused, snake_fused_supported

        if snake_fused_supported(x):
            # single-VMEM-pass Pallas kernel (fwd AND bwd) — XLA splits the
            # same math into several fusions with materialized f32
            # intermediates (ops/kernels/snake.py)
            return snake_fused(x, alpha, beta)
        return _snake_fast(x, alpha, beta)
    s = jnp.sin(x * alpha)
    return x + (1.0 / (beta + 1e-9)) * (s * s)


class SnakeBeta(nn.Module):
    """Per-channel snake-beta activation (BigVGAN-style).

    `__call__(x)` applies the activation; `__call__(dtype=...,
    return_params=True)` declares the same parameters (identical param
    paths/auto-naming) and returns the post-exp `(alpha, beta)` pair so a
    following conv can fuse the activation into its VMEM pass
    (ops/kernels/conv1d_snake.py) via `conv1d(..., pre_snake=...)`.
    """

    features: int
    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, *,
                 return_params: bool = False, dtype=None):
        if self.alpha_logscale:
            alpha = self.param("alpha", nn.initializers.zeros, (self.features,), jnp.float32)
            beta = self.param("beta", nn.initializers.zeros, (self.features,), jnp.float32)
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        else:
            alpha = self.param("alpha", nn.initializers.ones, (self.features,), jnp.float32)
            beta = self.param("beta", nn.initializers.ones, (self.features,), jnp.float32)
        if return_params:
            dt = dtype if dtype is not None else jnp.float32
            return alpha.astype(dt), beta.astype(dt)
        return snake_beta(x, alpha.astype(x.dtype), beta.astype(x.dtype))


def _kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed lowpass sinc filter (alias-free-torch filter design)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    return f / np.sum(f)


class AntiAliasedActivation(nn.Module):
    """2x-oversampled activation: upsample → act → downsample (alias-free)."""

    activation: nn.Module
    up_ratio: int = 2
    down_ratio: int = 2
    up_kernel_size: int = 12
    down_kernel_size: int = 12

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        up_filt = jnp.asarray(
            _kaiser_sinc_filter(0.5 / self.up_ratio, 0.6 / self.up_ratio, self.up_kernel_size),
            dtype=x.dtype,
        )
        down_filt = jnp.asarray(
            _kaiser_sinc_filter(0.5 / self.down_ratio, 0.6 / self.down_ratio, self.down_kernel_size),
            dtype=x.dtype,
        )
        B, T, _ = x.shape
        # Upsample: zero-stuff by ratio then filter (depthwise, grouped conv)
        k_up = jnp.tile(up_filt[:, None, None], (1, 1, C))
        pad = self.up_kernel_size // 2 - self.up_ratio // 2
        up = jax.lax.conv_general_dilated(
            x,
            k_up * self.up_ratio,
            window_strides=(1,),
            padding=[(pad + self.up_ratio - 1, pad)],
            lhs_dilation=(self.up_ratio,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C,
        )
        up = self.activation(up)
        # Downsample: filter then stride
        k_down = jnp.tile(down_filt[:, None, None], (1, 1, C))
        pad_d = self.down_kernel_size // 2 - self.down_ratio // 2
        down = jax.lax.conv_general_dilated(
            up,
            k_down,
            window_strides=(self.down_ratio,),
            padding=[(pad_d, pad_d + self.down_ratio - 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C,
        )
        return down[:, :T, :]


def get_activation(name: str, antialias: bool = False, channels: Optional[int] = None):
    """Activation factory mirroring reference autoencoders.py:32-46."""
    if name == "elu":
        act = _Elu()
    elif name == "snake":
        act = SnakeBeta(features=channels)
    elif name == "none":
        act = _Identity()
    else:
        raise ValueError(f"Unknown activation {name}")
    if antialias:
        act = AntiAliasedActivation(activation=act)
    return act


class _Elu(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.elu(x)


class _Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x
