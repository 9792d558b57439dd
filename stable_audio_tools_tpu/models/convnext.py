"""1-D ConvNeXt blocks + encoder/decoder (reference models/convnext.py).

Used by the ARC ConvNeXt discriminator head and optional AEs. NLC layout.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Conv1d, WNConv1d


class ConvNeXtBlock(nn.Module):
    dim: int
    kernel_size: int = 7
    mult: int = 4
    glu: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x
        pad = self.kernel_size // 2
        # depthwise conv
        kernel = self.param(
            "dw_kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.dim), jnp.float32,
        )
        x = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=self.dim,
        )
        up = self.dim * self.mult * (2 if self.glu else 1)
        x = WNConv1d(features=up, kernel_size=1, name="proj_up")(x)
        if self.glu:
            x, gate = jnp.split(x, 2, axis=-1)
            x = x * jax.nn.sigmoid(gate)
            x = jax.nn.silu(x)
        else:
            x = jax.nn.gelu(x)
        x = Conv1d(self.dim, 1, zero_init=True, name="proj_down")(x)
        return x + inp


class ConvNeXtEncoderBlock(nn.Module):
    out_channels: int
    stride: int
    num_blocks: int = 3

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        for i in range(self.num_blocks):
            x = ConvNeXtBlock(dim, name=f"block_{i}")(x)
        return WNConv1d(
            features=self.out_channels, kernel_size=2 * self.stride,
            stride=self.stride, padding=math.ceil(self.stride / 2),
            name="downsample",
        )(x)


class ConvNeXtEncoder(nn.Module):
    in_channels: int = 2
    channels: int = 128
    latent_dim: int = 32
    c_mults: tp.Tuple[int, ...] = (1, 2, 4, 8)
    strides: tp.Tuple[int, ...] = (2, 4, 8, 8)
    num_blocks_per_stage: int = 3

    @nn.compact
    def __call__(self, x):
        """x: [B, C, T] → [B, latent_dim, T/prod(strides)]."""
        xl = jnp.swapaxes(x, 1, 2)
        cm = (1,) + tuple(self.c_mults)
        xl = WNConv1d(features=cm[0] * self.channels, kernel_size=7, padding=3,
                      name="conv_in")(xl)
        for i in range(len(cm) - 1):
            xl = ConvNeXtEncoderBlock(
                out_channels=cm[i + 1] * self.channels, stride=self.strides[i],
                num_blocks=self.num_blocks_per_stage, name=f"stage_{i}",
            )(xl)
        xl = WNConv1d(features=self.latent_dim, kernel_size=3, padding=1,
                      name="conv_out")(xl)
        return jnp.swapaxes(xl, 1, 2)
