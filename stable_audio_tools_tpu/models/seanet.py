"""SEANet encoder/decoder (EnCodec), in-repo JAX version.

Rebuild target from SURVEY.md §2.9: the reference wraps the `encodec` pip
package (reference autoencoders.py:793-836). This module reproduces the pip
package's exact semantics so pretrained EnCodec / MusicGen-codec checkpoints
import bit-comparably:

- SConv1d padding (encodec modules/conv.py): asymmetric reflect padding
  `(pt - pt//2, pt//2 + extra)` where pt = k_eff - stride and `extra` aligns
  the input to whole output frames; causal mode pads left only.
- SConvTranspose1d: full transposed conv then unpad `(pt - pt//2, pt//2)`
  (causal: right trim by trim_right_ratio).
- SEANetResnetBlock (encodec modules/seanet.py): [ELU, conv k3 dil, ELU,
  conv k1] with a 1x1-conv shortcut when true_skip=False (the pip default
  used by the pretrained models).
- SLSTM: stacked torch nn.LSTM + input skip; here nn.RNN over
  nn.OptimizedLSTMCell (lax.scan inside), one cell per torch layer.

ELU stacks with residual units and a 2-layer LSTM bottleneck. NLC layout.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import WNConv1d, WNConvTranspose1d


def _pad1d(x, pl: int, pr: int, mode: str):
    """encodec pad1d, NLC. Reflect falls back to zero-extending tiny inputs."""
    if mode == "reflect":
        T = x.shape[1]
        max_pad = max(pl, pr)
        extra = 0
        if T <= max_pad:
            extra = max_pad - T + 1
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
        y = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)), mode="reflect")
        return y[:, : y.shape[1] - extra, :] if extra else y
    return jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))


class EncodecConv1d(nn.Module):
    """encodec SConv1d: WN conv with streaming-style asymmetric padding."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    causal: bool = False
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        pt = k_eff - self.stride
        T = x.shape[1]
        n_frames = (T - k_eff + pt) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (k_eff - pt)
        extra = max(ideal - T, 0)
        if self.causal:
            x = _pad1d(x, pt, extra, self.pad_mode)
        else:
            pr = pt // 2
            x = _pad1d(x, pt - pr, pr + extra, self.pad_mode)
        return WNConv1d(
            features=self.features, kernel_size=self.kernel_size,
            stride=self.stride, dilation=self.dilation, padding=0, name="conv",
        )(x)


class EncodecConvTranspose1d(nn.Module):
    """encodec SConvTranspose1d: full WN transposed conv, then unpad."""

    features: int
    kernel_size: int
    stride: int = 1
    causal: bool = False
    trim_right_ratio: float = 1.0

    @nn.compact
    def __call__(self, x):
        y = WNConvTranspose1d(
            features=self.features, kernel_size=self.kernel_size,
            stride=self.stride, padding=0, name="conv",
        )(x)
        pt = self.kernel_size - self.stride
        if self.causal:
            pr = math.ceil(pt * self.trim_right_ratio)
        else:
            pr = pt // 2
        pl = pt - pr
        return y[:, pl: y.shape[1] - pr if pr else None, :]


class SEANetResnetBlock(nn.Module):
    dim: int
    compress: int = 2
    dilation: int = 1
    kernel_size: int = 3
    true_skip: bool = False
    causal: bool = False
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.compress
        y = jax.nn.elu(x)
        y = EncodecConv1d(features=hidden, kernel_size=self.kernel_size,
                          dilation=self.dilation, causal=self.causal,
                          pad_mode=self.pad_mode, name="conv1")(y)
        y = jax.nn.elu(y)
        y = EncodecConv1d(features=self.dim, kernel_size=1, causal=self.causal,
                          pad_mode=self.pad_mode, name="conv2")(y)
        if not self.true_skip:
            x = EncodecConv1d(features=self.dim, kernel_size=1,
                              causal=self.causal, pad_mode=self.pad_mode,
                              name="shortcut")(x)
        return x + y


class SEANetLSTM(nn.Module):
    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.dim, name=f"lstm_{i}")
            y = nn.RNN(cell)(y)
        return x + y  # encodec skips around the LSTM


class SEANetEncoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (2, 2, 2, 2, 2)  # processed in order (config order)
    n_residual_layers: int = 1
    dilation_base: int = 2
    norm: str = "weight_norm"  # accepted for config parity; convs are WN
    lstm: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2

    @nn.compact
    def __call__(self, x):
        mult = 1
        x = EncodecConv1d(features=mult * self.n_filters,
                          kernel_size=self.kernel_size, causal=self.causal,
                          pad_mode=self.pad_mode, name="conv_in")(x)
        for i, ratio in enumerate(self.ratios):
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters, compress=self.compress,
                    dilation=self.dilation_base ** j,
                    kernel_size=self.residual_kernel_size,
                    true_skip=self.true_skip, causal=self.causal,
                    pad_mode=self.pad_mode, name=f"res_{i}_{j}",
                )(x)
            x = jax.nn.elu(x)
            x = EncodecConv1d(
                features=mult * self.n_filters * 2, kernel_size=ratio * 2,
                stride=ratio, causal=self.causal, pad_mode=self.pad_mode,
                name=f"down_{i}",
            )(x)
            mult *= 2
        if self.lstm:
            x = SEANetLSTM(mult * self.n_filters, num_layers=self.lstm,
                           name="lstm")(x)
        x = jax.nn.elu(x)
        x = EncodecConv1d(features=self.dimension,
                          kernel_size=self.last_kernel_size,
                          causal=self.causal, pad_mode=self.pad_mode,
                          name="conv_out")(x)
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
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    trim_right_ratio: float = 1.0
    final_tanh: bool = False

    @nn.compact
    def __call__(self, x):
        mult = 2 ** len(self.ratios)
        x = EncodecConv1d(features=mult * self.n_filters,
                          kernel_size=self.kernel_size, causal=self.causal,
                          pad_mode=self.pad_mode, name="conv_in")(x)
        if self.lstm:
            x = SEANetLSTM(mult * self.n_filters, num_layers=self.lstm,
                           name="lstm")(x)
        for i, ratio in enumerate(self.ratios):
            x = jax.nn.elu(x)
            x = EncodecConvTranspose1d(
                features=mult * self.n_filters // 2, kernel_size=ratio * 2,
                stride=ratio, causal=self.causal,
                trim_right_ratio=self.trim_right_ratio, name=f"up_{i}",
            )(x)
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters // 2, compress=self.compress,
                    dilation=self.dilation_base ** j,
                    kernel_size=self.residual_kernel_size,
                    true_skip=self.true_skip, causal=self.causal,
                    pad_mode=self.pad_mode, name=f"res_{i}_{j}",
                )(x)
            mult //= 2
        x = jax.nn.elu(x)
        x = EncodecConv1d(features=self.channels,
                          kernel_size=self.last_kernel_size,
                          causal=self.causal, pad_mode=self.pad_mode,
                          name="conv_out")(x)
        if self.final_tanh:
            x = jnp.tanh(x)
        return x
