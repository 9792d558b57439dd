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



def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """x: [..., C]; alpha/beta: [C]."""
    s = jnp.sin(x * alpha)
    return x + (1.0 / (beta + 1e-9)) * (s * s)


class SnakeBeta(nn.Module):
    """Per-channel snake-beta activation (BigVGAN-style)."""

    features: int
    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.alpha_logscale:
            alpha = self.param("alpha", nn.initializers.zeros, (self.features,), jnp.float32)
            beta = self.param("beta", nn.initializers.zeros, (self.features,), jnp.float32)
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        else:
            alpha = self.param("alpha", nn.initializers.ones, (self.features,), jnp.float32)
            beta = self.param("beta", nn.initializers.ones, (self.features,), jnp.float32)
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
