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
import os
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")

# Strided/transposed convs are rewritten to dense stride-1 convs via
# space-to-depth / depth-to-space (see conv1d_strided_s2d /
# conv_transpose1d_d2s). Exact rewrites; disable for A/B with
# SAT_DENSE_STRIDED=0.
_DENSE_STRIDED = os.environ.get("SAT_DENSE_STRIDED", "1") != "0"

# Stride-1 convs carry a custom VJP that computes the WEIGHT gradient as
# per-tap [Ci, B·L]x[B·L, Co] matmuls with f32 MXU accumulation instead of
# XLA's grad-conv lowering (which contracts over batch and runs at
# 1-16 TF/s in the GAN-step trace — the "weight-gradient convolutions"
# roofline lever). Exact math, A/B with SAT_CONV1D_CUSTOM_VJP=0.
_CUSTOM_CONV_VJP = os.environ.get("SAT_CONV1D_CUSTOM_VJP", "1") != "0"


def _wn_kernel(v: jax.Array, g: jax.Array, eps: float = 0.0) -> jax.Array:
    """Weight-normalized kernel. v: [k, in, out], g: [out] -> [k, in, out].

    Norm is over (k, in) per out channel, matching torch weight_norm(dim=0)
    on a [out, in, k] tensor.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return v * (g[None, None, :] / (norm + eps))


def _conv1d_raw(x, kernel, pad_lo, pad_hi, dilation):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        rhs_dilation=(dilation,),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=x.dtype,
    )


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv1d_s1(x, kernel, pad_lo, pad_hi, dilation):
    """Stride-1 NLC conv with a TPU-tuned backward (see _CUSTOM_CONV_VJP)."""
    return _conv1d_raw(x, kernel, pad_lo, pad_hi, dilation)


def _conv1d_s1_fwd(x, kernel, pad_lo, pad_hi, dilation):
    return _conv1d_raw(x, kernel, pad_lo, pad_hi, dilation), (x, kernel)


def _conv1d_s1_bwd(pad_lo, pad_hi, dilation, res, dy):
    x, kernel = res
    k, Ci, Co = kernel.shape
    d = dilation
    E = (k - 1) * d + 1
    # dx[t] = sum_j dy[t + pad_lo - j*d] K[j]  — the usual flipped/io-swapped
    # correlation; this IS what XLA emits and it runs fine on the MXU.
    kT = jnp.flip(kernel, 0).transpose(0, 2, 1)
    dx = jax.lax.conv_general_dilated(
        dy,
        kT,
        window_strides=(1,),
        padding=[(E - 1 - pad_lo, E - 1 - pad_hi)],
        rhs_dilation=(d,),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=dy.dtype,
    )
    # dW[j,ci,co] = sum_{b,l} xpad[b, l + j*d, ci] dy[b, l, co]. On TPU a
    # Pallas streaming kernel reads x and dy ONCE and keeps the [k,Ci,CoB]
    # f32 accumulator in VMEM (kernels/conv1d_snake.py); otherwise one
    # [Ci, B·Lout]x[B·Lout, Co] matmul per tap (k is 1-7 here), contracting
    # over the LONG axis in f32 on the MXU. XLA's grad-conv lowering of the
    # same contraction runs at 1-16 TF/s in the GAN-step trace.
    Lout = dy.shape[1]
    if jax.default_backend() == "tpu":
        from .kernels.conv1d_snake import conv1d_wgrad, wgrad_kernel_supported

        if wgrad_kernel_supported(k, Ci, Co, d, Lout):
            dW = conv1d_wgrad(dy, x, (k, Ci, Co), pad_lo, pad_hi, d,
                              interpret=False).astype(kernel.dtype)
            return dx, dW
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    dW = jnp.stack(
        [
            jax.lax.dot_general(
                jax.lax.dynamic_slice_in_dim(xp, j * d, Lout, 1),
                dy,
                (((0, 1), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for j in range(k)
        ],
        0,
    ).astype(kernel.dtype)
    return dx, dW


_conv1d_s1.defvjp(_conv1d_s1_fwd, _conv1d_s1_bwd)


def _dispatch_pre_snake(x, kernel, bias, alpha, beta, pad_lo, pad_hi,
                        dilation: int = 1) -> jax.Array:
    """Fused snake→conv where supported; snake-then-conv otherwise."""
    from .kernels.conv1d_snake import snake_conv1d, snake_conv1d_supported

    if snake_conv1d_supported(x, kernel, 1, dilation):
        b = bias if bias is not None else jnp.zeros((kernel.shape[-1],), x.dtype)
        return snake_conv1d(x, kernel, b, alpha, beta, pad_lo, pad_hi, dilation)
    from .activations import snake_beta

    sx = snake_beta(x, alpha, beta)
    if _CUSTOM_CONV_VJP:
        out = _conv1d_s1(sx, kernel, pad_lo, pad_hi, dilation)
    else:
        out = _conv1d_raw(sx, kernel, pad_lo, pad_hi, dilation)
    return out if bias is None else out + bias


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: Union[int, str] = 0,
    dilation: int = 1,
    groups: int = 1,
    pre_snake: Optional[Tuple[jax.Array, jax.Array]] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """Functional NLC conv1d with torch-style integer padding.

    pre_snake=(alpha, beta) fuses a preceding snake-beta activation into
    the conv (one VMEM pass, ops/kernels/conv1d_snake.py) where supported;
    otherwise the activation is applied as a separate op. Exact because
    snake(0) = 0 commutes with the conv zero padding.
    residual (same shape as the output) fuses a trailing `+ residual` into
    the kernel's output pass where supported — the codec ResidualUnit's
    skip add was a separate audio-rate HBM pass otherwise.
    """
    if (
        _DENSE_STRIDED and stride > 1 and dilation == 1 and groups == 1
        and isinstance(padding, int)
    ):
        out = conv1d_strided_s2d(x, kernel, bias, stride=stride,
                                 padding=padding, pre_snake=pre_snake)
        return out if residual is None else out + residual
    if pre_snake is not None:
        from .kernels.conv1d_snake import (
            snake_conv1d, snake_conv1d_res, snake_conv1d_supported)

        alpha, beta = pre_snake
        if (snake_conv1d_supported(x, kernel, stride, dilation, groups)
                and isinstance(padding, int)):
            b = bias if bias is not None else jnp.zeros(
                (kernel.shape[-1],), x.dtype)
            k = kernel.shape[0]
            l_out = x.shape[1] + 2 * padding - ((k - 1) * dilation + 1) + 1
            if (residual is not None
                    and residual.shape == (x.shape[0], l_out,
                                           kernel.shape[-1])):
                return snake_conv1d_res(x, kernel, b, alpha, beta, residual,
                                        padding, padding, dilation)
            out = snake_conv1d(x, kernel, b, alpha, beta,
                               padding, padding, dilation)
            return out if residual is None else out + residual
        from .activations import snake_beta

        x = snake_beta(x, alpha, beta)
        return conv1d(x, kernel, bias, stride=stride, padding=padding,
                      dilation=dilation, groups=groups, residual=residual)
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

    if _CUSTOM_CONV_VJP and stride == 1 and groups == 1:
        out = _conv1d_s1(x, kernel, pad[0][0], pad[0][1], dilation)
        if bias is not None:
            out = out + bias
        return out if residual is None else out + residual

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


def conv1d_strided_s2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
    pre_snake: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Strided conv1d as space-to-depth + a dense stride-1 conv. Exact.

    A stride-s conv maps poorly onto the TPU conv path once gradients are
    taken: the input gradient of a strided conv is an lhs-dilated conv whose
    MACs are (s-1)/s zeros. Folding s input samples into channels turns the
    forward AND both gradient convs into dense stride-1 convs (the whole
    problem is one [B*Lout, m*s*Ci] x [m*s*Ci, Co] matmul on the MXU).

    out[t] = sum_j xpad[t*s + j] K[j]: t*s is always block-aligned, so with
    xpad reshaped to [B, Lb, s*Ci] and K zero-padded to m*s taps and reshaped
    to [m, s*Ci, Co] (m = ceil(k/s)), the strided conv IS a valid stride-1
    conv of kernel size m. For the codec down-convs (k = 2s) m = 2 with no
    kernel padding waste.
    """
    k, Ci, Co = kernel.shape
    s = stride
    L = x.shape[1]
    Lout = (L + 2 * padding - k) // s + 1
    m = -(-k // s)
    N = (Lout - 1 + m) * s  # exact padded length every block of which is read
    x = jax.lax.pad(
        x, jnp.zeros((), x.dtype),
        [(0, 0, 0), (padding, N - L - padding, 0), (0, 0, 0)],
    )
    xb = x.reshape(x.shape[0], N // s, s * Ci)
    kb = jnp.pad(kernel, ((0, m * s - k), (0, 0), (0, 0))).reshape(m, s * Ci, Co)
    if pre_snake is not None:
        # snake is per-channel: in the blocked layout alpha/beta tile s×
        # (snake(0) = 0 keeps the inserted zero padding exact)
        alpha, beta = pre_snake
        return _dispatch_pre_snake(xb, kb, bias, jnp.tile(alpha, s),
                                   jnp.tile(beta, s), 0, 0)
    if _CUSTOM_CONV_VJP:
        out = _conv1d_s1(xb, kb, 0, 0, 1)
    else:
        out = jax.lax.conv_general_dilated(
            xb, kb, window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=x.dtype,
        )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose1d_d2s(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
    pre_snake: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Transposed conv1d as a dense stride-1 conv + depth-to-space. Exact.

    The lhs-dilated form (conv_transpose1d) multiplies s-1 zeros per real
    sample on the MXU — s× the useful MACs — and its weight/input gradients
    inherit the dilation. Emitting all s output phases as channels of ONE
    dense conv (z[i, r*Co+co] = sum_b x[i-b] K[b*s + r]) does exactly the
    useful work; the phase axis then interleaves back via a reshape.

    out[o] = sum_i x[i] K[o + p - i*s] (torch ConvTranspose1d semantics,
    matching conv_transpose1d above). With u = o + p = i'*s + r the taps are
    b = i' - i in [0, m), m = ceil(k/s).
    """
    k, Ci, Co = kernel.shape
    s = stride
    Lin = x.shape[1]
    out_len = (Lin - 1) * s - 2 * padding + k
    m = -(-k // s)
    kp = jnp.pad(kernel, ((0, m * s - k), (0, 0), (0, 0)))
    kb = kp.reshape(m, s, Ci, Co)
    # z[i'] = sum_w xpad[i' + w] Kz[w], xpad left pad m-1 → x[i' + w - (m-1)];
    # tap b = m-1-w, phase r goes channel-major-fast: [m, Ci, s*Co]
    kz = jnp.flip(kb, axis=0).transpose(0, 2, 1, 3).reshape(m, Ci, s * Co)
    if pre_snake is not None:
        # bias is per real out-channel; phase-major in the d2s layout
        alpha, beta = pre_snake
        tiled_b = None if bias is None else jnp.tile(bias, s)
        z = _dispatch_pre_snake(x, kz, tiled_b, alpha, beta, m - 1, m - 1)
        B = x.shape[0]
        z = z.reshape(B, (Lin + m - 1) * s, Co)
        return z[:, padding:padding + out_len]
    if _CUSTOM_CONV_VJP:
        z = _conv1d_s1(x, kz, m - 1, m - 1, 1)
    else:
        z = jax.lax.conv_general_dilated(
            x, kz, window_strides=(1,), padding=[(m - 1, m - 1)],
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=x.dtype,
        )
    B = x.shape[0]
    z = z.reshape(B, (Lin + m - 1) * s, Co)
    out = z[:, padding:padding + out_len]
    if bias is not None:
        out = out + bias
    return out


def conv_transpose1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
    pre_snake: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Functional NLC transposed conv1d with torch ConvTranspose1d semantics.

    kernel: [k, in, out] (WIO for the equivalent forward correlation).
    Implemented as an input-dilated convolution with a spatially flipped
    kernel — a single fused XLA op, no explicit upsample buffer. When
    stride > 1 this dispatches to the dense depth-to-space form
    (conv_transpose1d_d2s), which does the same math without multiplying
    the dilation zeros on the MXU.
    """
    if _DENSE_STRIDED and stride > 1:
        return conv_transpose1d_d2s(x, kernel, bias, stride=stride,
                                    padding=padding, pre_snake=pre_snake)
    if pre_snake is not None:
        from .activations import snake_beta

        x = snake_beta(x, *pre_snake)
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
    def __call__(self, x: jax.Array,
                 pre_snake: Optional[Tuple[jax.Array, jax.Array]] = None,
                 residual: Optional[jax.Array] = None,
                 ) -> jax.Array:
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
        if pre_snake is not None:
            pre_snake = tuple(p.astype(dtype) for p in pre_snake)
        if residual is not None:
            residual = residual.astype(dtype)
        return conv1d(
            x.astype(dtype),
            kernel.astype(dtype),
            bias.astype(dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            pre_snake=pre_snake,
            residual=residual,
        )


def _conv2d_raw_nhwc(x, kernel, padding, h_dilation):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=padding,
        rhs_dilation=(h_dilation, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv2d_small_cin(x, kernel, padding, h_dilation):
    """Stride-1 NHWC conv2d restructured for small Ci (im2col + matmuls).

    XLA lowers both the forward and the dgrad of a Ci-channel conv with Ci
    as the contraction/output lane dim — at the discriminators' first layer
    (packed Ci=8) that is 8/128 MXU lanes (forward measured 4.8 TF/s,
    ~17 ms of the GAN-step pair in the round-5 trace). Instead:

    - forward: kh·kw statically-shifted slices concat into im2col patches
      [B,Ho,Wo,kh·kw·Ci] (HBM-speed), then ONE full-width matmul vs
      kernel [kh·kw·Ci, Co];
    - dW: the same patches contracted against dy — M = kh·kw·Ci taps wide;
    - dx: one matmul dy·K^T over Co producing per-tap planes, then an
      overlap-add of statically-padded slices (fused adds, no
      dynamic-update-slice serialization).

    Exact: same contractions, f32 accumulation in every matmul.
    """
    patches, _, _ = _im2col_patches(x, kernel.shape, padding, h_dilation)
    kh, kw, Ci, Co = kernel.shape
    out = jax.lax.dot_general(
        patches, kernel.reshape(kh * kw * Ci, Co),
        (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def _im2col_patches(x, kshape, padding, h_dilation):
    kh, kw, Ci, _ = kshape
    (pt_lo, pt_hi), (pl_lo, pl_hi) = padding
    xp = jnp.pad(x, ((0, 0), (pt_lo, pt_hi), (pl_lo, pl_hi), (0, 0)))
    B, Hp, Wp, _ = xp.shape
    Ho = Hp - (kh - 1) * h_dilation
    Wo = Wp - (kw - 1)
    slabs = [
        jax.lax.slice(xp, (0, u * h_dilation, v, 0),
                      (B, u * h_dilation + Ho, v + Wo, Ci))
        for u in range(kh) for v in range(kw)
    ]
    return jnp.concatenate(slabs, axis=-1), Ho, Wo


def _conv2d_small_cin_fwd(x, kernel, padding, h_dilation):
    return _conv2d_small_cin(x, kernel, padding, h_dilation), (x, kernel)


def _conv2d_small_cin_bwd(padding, h_dilation, res, dy):
    x, kernel = res
    kh, kw, Ci, Co = kernel.shape
    (pt_lo, _), (pl_lo, _) = padding
    B, Ho, Wo, _ = dy.shape
    _, Hin, Win, _ = x.shape
    # dW: rebuild the im2col patches (cheap slices; saving them would make
    # the residual kh*kw times the activation) and contract against dy —
    # full-width M = kh*kw*Ci instead of XLA's Ci-lane wgrad
    patches, _, _ = _im2col_patches(x, kernel.shape, padding, h_dilation)
    dW = jax.lax.dot_general(
        patches.reshape(-1, kh * kw * Ci), dy.reshape(-1, Co),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(kh, kw, Ci, Co).astype(kernel.dtype)
    # dx: T[b,i,j,(u,v,ci)] = sum_co dy[b,i,j,co] K[u,v,ci,co] — one matmul
    # with kh·kw·Ci output lanes instead of Ci
    kr = kernel.reshape(kh * kw * Ci, Co)
    t = jax.lax.dot_general(
        dy.reshape(-1, Co), kr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(B, Ho, Wo, kh, kw, Ci)
    # Overlap-add as statically-padded adds (one fusion; the earlier
    # .at[].add form serialized kh*kw dynamic-update-slices, ~14 ms/pair in
    # the round-5 trace). Kept in f32: a bf16 per-tap cast would round and
    # accumulate up to kh*kw adds in bf16 — a numerics regression vs XLA's
    # f32-accumulated dgrad; one cast to x.dtype after the final slice.
    Hp = Ho + (kh - 1) * h_dilation
    Wp = Wo + kw - 1
    dxp = None
    for u in range(kh):
        for v in range(kw):
            piece = jnp.pad(
                t[:, :, :, u, v, :],
                ((0, 0), (u * h_dilation, Hp - Ho - u * h_dilation),
                 (v, Wp - Wo - v), (0, 0)))
            dxp = piece if dxp is None else dxp + piece
    dx = jax.lax.slice(
        dxp, (0, pt_lo, pl_lo, 0), (B, pt_lo + Hin, pl_lo + Win, Ci))
    return dx.astype(x.dtype), dW


_conv2d_small_cin.defvjp(_conv2d_small_cin_fwd, _conv2d_small_cin_bwd)

# dgrad restructure pays off while Ci lanes ≪ 128; beyond ~32 the native
# lowering is within reach of the matmul + overlap-add form
_SMALL_CIN_MAX = 32


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
            pad2 = [(pt, pt), (ul, ur)]
            if 2 * in_ch <= _SMALL_CIN_MAX:
                out = _conv2d_small_cin(
                    x.astype(dtype), kp.astype(dtype), tuple(pad2),
                    self.dilation[0])
            else:
                out = jax.lax.conv_general_dilated(
                    x.astype(dtype),
                    kp.astype(dtype),
                    window_strides=(1, 1),
                    padding=pad2,
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
        if (in_ch <= _SMALL_CIN_MAX and self.stride == (1, 1)
                and self.dilation[1] == 1 and not isinstance(pad, str)):
            out = _conv2d_small_cin(
                x.astype(dtype), kernel.astype(dtype),
                tuple(tuple(p) for p in pad), self.dilation[0])
        else:
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
    def __call__(self, x: jax.Array,
                 pre_snake: Optional[Tuple[jax.Array, jax.Array]] = None,
                 ) -> jax.Array:
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
        if pre_snake is not None:
            pre_snake = tuple(p.astype(dtype) for p in pre_snake)
        return conv_transpose1d(
            x.astype(dtype),
            kernel.astype(dtype),
            bias.astype(dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
            pre_snake=pre_snake,
        )
