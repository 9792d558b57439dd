"""1-D convolutions for TPU (NLC layout, XLA `conv_general_dilated` → MXU).

Implements the conv variants the reference builds its codecs from
(reference: stable_audio_tools/models/autoencoders.py:24-28 WNConv1d /
WNConvTranspose1d via torch weight_norm), with PyTorch-compatible semantics:

- weight normalization: w = g * v / ||v||, norm taken over (in, k) per
  output channel (torch weight_norm dim=0 on a [out, in, k] weight).
- integer `padding` pads both sides like torch Conv1d.
- ConvTranspose1d: out_len = (in_len - 1) * stride - 2 * padding + kernel.

Layout: activations are [batch, length, channels] (NLC); kernels are stored
WIO ([kernel, in, out]) so XLA maps the contraction straight onto the MXU
without transposes.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def _wn_kernel(v: jax.Array, g: jax.Array, eps: float = 0.0) -> jax.Array:
    """Weight-normalized kernel. v: [k, in, out], g: [out] -> [k, in, out].

    Norm is over (k, in) per out channel, matching torch weight_norm(dim=0)
    on a [out, in, k] tensor.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return v * (g[None, None, :] / (norm + eps))


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: Union[int, str] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Functional NLC conv1d with torch-style integer padding."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    elif padding == "same":
        k_eff = (kernel.shape[0] - 1) * dilation + 1
        pad_total = k_eff - 1
        pad = [(pad_total // 2, pad_total - pad_total // 2)]
    elif padding == "causal":
        k_eff = (kernel.shape[0] - 1) * dilation + 1
        pad = [(k_eff - 1, 0)]
    elif padding == "valid":
        pad = [(0, 0)]
    else:
        raise ValueError(f"Unknown padding {padding}")

    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Functional NLC transposed conv1d with torch ConvTranspose1d semantics.

    kernel: [k, in, out] (WIO for the equivalent forward correlation).
    Implemented as an input-dilated convolution with a spatially flipped
    kernel — a single fused XLA op, no explicit upsample buffer.
    """
    k = kernel.shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


class Conv1d(nn.Module):
    """Plain conv1d, NLC. Weight stored WIO; torch-compatible init."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Union[int, str] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    zero_init: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch // self.groups, self.features)
        # torch Conv1d default: U(-sqrt(k), sqrt(k)), k = 1/(in*kernel)
        bound = 1.0 / math.sqrt(in_ch // self.groups * self.kernel_size)

        def u_init(key, s, dt):
            return jax.random.uniform(key, s, dt, -bound, bound)

        kernel = self.param(
            "kernel", nn.initializers.zeros if self.zero_init else u_init, shape, jnp.float32
        )
        bias = None
        if self.use_bias:
            bias = self.param("bias", u_init, (self.features,), jnp.float32)
        dtype = self.dtype or x.dtype
        return conv1d(
            x.astype(dtype),
            kernel.astype(dtype),
            bias.astype(dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )


class WNConv1d(nn.Module):
    """Weight-normalized conv1d (torch weight_norm(Conv1d) equivalent), NLC."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Union[int, str] = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch, self.features)
        bound = 1.0 / math.sqrt(in_ch * self.kernel_size)

        def v_init(key, s, dt):
            return jax.random.uniform(key, s, dt, -bound, bound)

        v = self.param("v", v_init, shape, jnp.float32)
        # torch weight_norm init: g = ||v|| so w == v at init
        def g_init(key, s, dt):
            del key
            return jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1)))

        g = self.param("g", g_init, (self.features,), jnp.float32)
        kernel = _wn_kernel(v, g)
        bias = None
        if self.use_bias:
            def b_init(key, s, dt):
                return jax.random.uniform(key, s, dt, -bound, bound)
            bias = self.param("bias", b_init, (self.features,), jnp.float32)
        dtype = self.dtype or x.dtype
        return conv1d(
            x.astype(dtype),
            kernel.astype(dtype),
            bias.astype(dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
        )


def pack_w_pairs(x: jax.Array) -> jax.Array:
    """NHWC [B, H, W, C] → [B, H, W/2, 2C] by folding W pairs into channels.

    Channel layout is pair-major: packed channel p*C + c holds column parity
    p. W must be even (pad first). Used to lift 64-channel discriminator
    convs onto full 128-lane tiles — see WNConv2d(w_packed=True)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def unpack_w_pairs(x: jax.Array) -> jax.Array:
    """Inverse of pack_w_pairs: [B, H, W2, 2C] → [B, H, 2*W2, C]."""
    B, H, W2, C2 = x.shape
    return x.reshape(B, H, W2 * 2, C2 // 2)


def _pack_kernel_w(kernel: jax.Array, padw: int):
    """HWIO kernel [kh, kw, Ci, Co] → pair-packed [kh, U, 2Ci, 2Co].

    Exact rewrite of a stride-1, dilation-1 W-axis convolution in the
    pack_w_pairs representation: output column 2v+q reads input column
    2v+q+o-padw = 2(u+v)+p, so each output parity q is the original kernel
    shifted by q and split into (u, p). Implemented as two pads + reshapes —
    no scatter. Returns (packed_kernel, u_pad_left, u_pad_right)."""
    kh, kw, Ci, Co = kernel.shape
    pm = padw % 2
    U = (pm + kw) // 2 + 1
    blocks = []
    for q in (0, 1):
        lp = q + pm
        kq = jnp.pad(kernel, ((0, 0), (lp, 2 * U - lp - kw), (0, 0), (0, 0)))
        blocks.append(kq.reshape(kh, U, 2, Ci, Co))  # [kh, u, p, ci, co]
    kp = jnp.stack(blocks, axis=4)          # [kh, u, p, ci, q, co]
    kp = kp.reshape(kh, U, 2 * Ci, 2 * Co)  # (p, ci) major → 2Ci; (q, co) → 2Co
    u_base = (padw + pm) // 2
    return kp, u_base, U - 1 - u_base


class WNConv2d(nn.Module):
    """Weight-normalized conv2d, NHWC. kernel stored HWIO; g per out-channel.

    w_packed=True consumes/produces the pack_w_pairs layout ([B, H, W/2, 2C]):
    the stored parameters keep the reference shapes, but the conv runs with
    both channel dims doubled so 64-channel discriminator stacks use all 128
    MXU lanes (measured 1.8× fwd+bwd on the EnCodec MS-STFT stack at SA-2.0
    scale). Requires stride 1 and dilation 1 on W, symmetric W padding of
    (kw-1)//2."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Union[Tuple[int, int], str] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    w_packed: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1] // 2 if self.w_packed else x.shape[-1]
        kh, kw = self.kernel_size
        shape = (kh, kw, in_ch, self.features)
        bound = 1.0 / math.sqrt(in_ch * kh * kw)

        def v_init(key, s, dt):
            return jax.random.uniform(key, s, dt, -bound, bound)

        v = self.param("v", v_init, shape, jnp.float32)

        def g_init(key, s, dt):
            del key
            return jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)))

        g = self.param("g", g_init, (self.features,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True))
        kernel = v * (g[None, None, None, :] / norm)
        bias = None
        if self.use_bias:
            def b_init(key, s, dt):
                return jax.random.uniform(key, s, dt, -bound, bound)
            bias = self.param("bias", b_init, (self.features,), jnp.float32)
        dtype = self.dtype or x.dtype
        if self.w_packed:
            assert not isinstance(self.padding, str)
            pt, pw = self.padding
            assert (self.stride == (1, 1) and self.dilation[1] == 1
                    and kw % 2 == 1 and pw == (kw - 1) // 2), (
                "w_packed needs stride 1 / w-dilation 1 / odd kw with same "
                "w-padding (even kw would change the output width)")
            kp, ul, ur = _pack_kernel_w(kernel, pw)
            out = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kp.astype(dtype),
                window_strides=(1, 1),
                padding=[(pt, pt), (ul, ur)],
                rhs_dilation=(self.dilation[0], 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                out = out + jnp.tile(bias, 2).astype(dtype)
            return out
        if isinstance(self.padding, str):
            pad = self.padding.upper()
        else:
            pad = [(p, p) for p in self.padding]
        out = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=self.stride,
            padding=pad,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            out = out + bias.astype(dtype)
        return out


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed conv1d (torch ConvTranspose1d), NLC.

    Weight-norm matches torch semantics on the torch layout [in, out, k]
    with dim=0: the norm is over (out, k) per *input* channel.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch, self.features)  # WIO
        bound = 1.0 / math.sqrt(in_ch * self.kernel_size)

        def v_init(key, s, dt):
            return jax.random.uniform(key, s, dt, -bound, bound)

        v = self.param("v", v_init, shape, jnp.float32)

        def g_init(key, s, dt):
            del key
            return jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2)))

        # g: [in] — torch weight_norm dim=0 on [in, out, k]
        g = self.param("g", g_init, (in_ch,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True))
        kernel = v * (g[None, :, None] / norm)
        bias = None
        if self.use_bias:
            def b_init(key, s, dt):
                return jax.random.uniform(key, s, dt, -bound, bound)
            bias = self.param("bias", b_init, (self.features,), jnp.float32)
        dtype = self.dtype or x.dtype
        return conv_transpose1d(
            x.astype(dtype),
            kernel.astype(dtype),
            bias.astype(dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
        )
