"""SEANet encoder/decoder (EnCodec), in-repo JAX version.

Rebuild target from SURVEY.md §2.9: the reference wraps the `encodec` pip
package (reference autoencoders.py:793-836). ELU conv stacks with residual
units and a 2-layer LSTM bottleneck; the LSTM runs as nn.RNN over an
nn.OptimizedLSTMCell (lax.scan inside). NLC layout.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import WNConv1d, WNConvTranspose1d


class SEANetResnetBlock(nn.Module):
    dim: int
    compress: int = 2
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.compress
        y = jax.nn.elu(x)
        y = WNConv1d(features=hidden, kernel_size=3, dilation=self.dilation,
                     padding=self.dilation, name="conv1")(y)
        y = jax.nn.elu(y)
        y = WNConv1d(features=self.dim, kernel_size=1, name="conv2")(y)
        return x + y


class SEANetLSTM(nn.Module):
    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.num_layers):
            rnn = nn.RNN(nn.OptimizedLSTMCell(self.dim), name=f"lstm_{i}")
            y = rnn(y)
        return x + y  # encodec skips around the LSTM


class SEANetEncoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (2, 2, 2, 2, 2)  # NB: caller reverses (factory)
    n_residual_layers: int = 1
    dilation_base: int = 2
    norm: str = "weight_norm"  # accepted for config parity; convs are WN
    lstm: int = 2

    @nn.compact
    def __call__(self, x):
        mult = 1
        x = WNConv1d(features=mult * self.n_filters, kernel_size=7, padding=3,
                     name="conv_in")(x)
        for i, ratio in enumerate(self.ratios):
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(mult * self.n_filters,
                                      dilation=self.dilation_base ** j,
                                      name=f"res_{i}_{j}")(x)
            x = jax.nn.elu(x)
            # encodec pads kernel-stride total, asymmetric → exact T/ratio
            x = WNConv1d(
                features=mult * self.n_filters * 2, kernel_size=ratio * 2, stride=ratio,
                padding="same", name=f"down_{i}",
            )(x)
            mult *= 2
        if self.lstm:
            x = SEANetLSTM(mult * self.n_filters, num_layers=self.lstm, name="lstm")(x)
        x = jax.nn.elu(x)
        x = WNConv1d(features=self.dimension, kernel_size=7, padding=3, name="conv_out")(x)
        return x


class SEANetDecoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    dilation_base: int = 2
    norm: str = "weight_norm"  # accepted for config parity; convs are WN
    lstm: int = 2
    final_tanh: bool = False

    @nn.compact
    def __call__(self, x):
        mult = 2 ** len(self.ratios)
        x = WNConv1d(features=mult * self.n_filters, kernel_size=7, padding=3,
                     name="conv_in")(x)
        if self.lstm:
            x = SEANetLSTM(mult * self.n_filters, num_layers=self.lstm, name="lstm")(x)
        for i, ratio in enumerate(self.ratios):
            x = jax.nn.elu(x)
            target_len = x.shape[1] * ratio
            x = WNConvTranspose1d(
                features=mult * self.n_filters // 2, kernel_size=ratio * 2, stride=ratio,
                padding=ratio // 2 + ratio % 2, name=f"up_{i}",
            )(x)
            # encodec trims transpose-conv tails to the exact upsampled length
            if x.shape[1] < target_len:
                x = jnp.pad(x, ((0, 0), (0, target_len - x.shape[1]), (0, 0)))
            elif x.shape[1] > target_len:
                x = x[:, :target_len, :]
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(mult * self.n_filters // 2,
                                      dilation=self.dilation_base ** j,
                                      name=f"res_{i}_{j}")(x)
            mult //= 2
        x = jax.nn.elu(x)
        x = WNConv1d(features=self.channels, kernel_size=7, padding=3, name="conv_out")(x)
        if self.final_tanh:
            x = jnp.tanh(x)
        return x
