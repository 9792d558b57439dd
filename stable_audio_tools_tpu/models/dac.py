"""DAC (descript-audio-codec) encoder/decoder blocks, in-repo JAX version.

Rebuild target from SURVEY.md §2.9: the reference wraps the `dac` pip package
(reference autoencoders.py:365-398). Structure follows dac.model.dac:
Snake1d (alpha-only snake) + weight-normed convs; encoder channels double per
stride block, decoder halves. NLC layout.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import WNConv1d, WNConvTranspose1d


class Snake1d(nn.Module):
    """DAC snake: x + (1/alpha) * sin^2(alpha * x), per-channel alpha."""

    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.features,), jnp.float32)
        from ..ops.activations import sin2_fast, use_fast_sin2

        if use_fast_sin2():
            xf = x.astype(jnp.float32)
            s2 = sin2_fast(alpha * xf)
            return (xf + (1.0 / (alpha + 1e-9)) * s2).astype(x.dtype)
        a = alpha.astype(x.dtype)
        s = jnp.sin(a * x)
        return x + (1.0 / (a + 1e-9)) * s * s


class DACResidualUnit(nn.Module):
    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(self.dim)(x)
        y = WNConv1d(features=self.dim, kernel_size=7, dilation=self.dilation,
                     padding=pad, name="conv1")(y)
        y = Snake1d(self.dim)(y)
        y = WNConv1d(features=self.dim, kernel_size=1, name="conv2")(y)
        return x + y


class DACEncoderBlock(nn.Module):
    dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate((1, 3, 9)):
            x = DACResidualUnit(self.dim // 2, dilation=d, name=f"res_{i}")(x)
        x = Snake1d(self.dim // 2)(x)
        x = WNConv1d(
            features=self.dim, kernel_size=2 * self.stride, stride=self.stride,
            padding=math.ceil(self.stride / 2), name="down",
        )(x)
        return x


class DACEncoder(nn.Module):
    d_model: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    d_latent: Optional[int] = None
    latent_dim: Optional[int] = None
    in_channels: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        x = WNConv1d(features=d, kernel_size=7, padding=3, name="conv_in")(x)
        for i, stride in enumerate(self.strides):
            d *= 2
            x = DACEncoderBlock(dim=d, stride=stride, name=f"block_{i}")(x)
        x = Snake1d(d)(x)
        out_dim = self.d_latent or d
        x = WNConv1d(features=out_dim, kernel_size=3, padding=1, name="conv_out")(x)
        # reference DACEncoderWrapper backwards-compat proj (autoencoders.py:377-380)
        if self.latent_dim is not None:
            x = nn.Dense(self.latent_dim, name="proj_out", param_dtype=jnp.float32)(x)
        return x


class DACDecoderBlock(nn.Module):
    input_dim: int
    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = Snake1d(self.input_dim)(x)
        x = WNConvTranspose1d(
            features=self.output_dim, kernel_size=2 * self.stride, stride=self.stride,
            padding=math.ceil(self.stride / 2), name="up",
        )(x)
        for i, d in enumerate((1, 3, 9)):
            x = DACResidualUnit(self.output_dim, dilation=d, name=f"res_{i}")(x)
        return x


class DACDecoder(nn.Module):
    input_channel: int = 64
    channels: int = 1536
    rates: Sequence[int] = (8, 8, 4, 2)
    d_out: int = 1
    final_tanh: bool = True

    @nn.compact
    def __call__(self, x):
        x = WNConv1d(features=self.channels, kernel_size=7, padding=3, name="conv_in")(x)
        ch = self.channels
        for i, stride in enumerate(self.rates):
            out_ch = ch // 2
            x = DACDecoderBlock(input_dim=ch, output_dim=out_ch, stride=stride,
                                name=f"block_{i}")(x)
            ch = out_ch
        x = Snake1d(ch)(x)
        x = WNConv1d(features=self.d_out, kernel_size=7, padding=3, name="conv_out")(x)
        if self.final_tanh:
            x = jnp.tanh(x)
        return x
