"""Pallas fused LayerNorm for TPU.

XLA lowers a last-axis LayerNorm over [B, N, C] bf16 activations into a
convert+reduce stats fusion plus a separate apply fusion; at SA-Open DiT
shape ([2,1025,1536]) the stats pass alone measures ~200us — ~26x the
~8us memory roofline — and the three per-block norms add up to ~7ms of a
~30ms sampler step. This kernel does stats + normalize + affine in one
VMEM pass (read x once, write y once), f32 row statistics, matching
`ops.norms.layer_norm` numerics (two-pass mean/variance).

Forward-only Pallas; the backward is the standard analytic LayerNorm
gradient in plain XLA (training steps are matmul-bound, the forward scan
of the sampler is where the stats passes dominated).

Reference semantics: stable_audio_tools/models/transformer.py:215-250
(bias-less fp32 LayerNorm).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 256


def _ln_kernel(x_ref, g_ref, o_ref, *, eps, has_beta, b_ref=None):
    x = x_ref[...].astype(jnp.float32)  # [R, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
    if has_beta:
        y = y + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_kernel_beta(x_ref, g_ref, b_ref, o_ref, *, eps):
    _ln_kernel(x_ref, g_ref, o_ref, eps=eps, has_beta=True, b_ref=b_ref)


def _ln_forward(x, gamma, beta, eps):
    orig_shape = x.shape
    C = orig_shape[-1]
    xf = x.reshape(-1, C)
    R = xf.shape[0]
    # No explicit row pad: Pallas masks the ragged tail block itself (reads
    # of out-of-bounds rows are junk but stats are strictly row-local, and
    # out-of-bounds stores are dropped). The jnp.pad + out[:R] slice this
    # replaces cost more HBM time per call (~9+5 us at [2050,1536]) than the
    # fused kernel itself (~6 us).
    g2 = gamma.reshape(1, C)
    args = [xf, g2]
    in_specs = [
        pl.BlockSpec((_BLOCK_ROWS, C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if beta is not None:
        kernel = functools.partial(_ln_kernel_beta, eps=eps)
        args.append(beta.reshape(1, C))
        in_specs.append(
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM))
    else:
        kernel = functools.partial(_ln_kernel, eps=eps, has_beta=False)
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(R, _BLOCK_ROWS),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_BLOCK_ROWS, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out.reshape(orig_shape)


def _xla_layer_norm(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    if beta is not None:
        out = out + beta.astype(jnp.float32)
    return out.astype(x.dtype)


def _ln_residuals(x, gamma, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (xf - mean) * rstd, rstd  # xhat f32, rstd f32


def _ln_backward(x, gamma, g, eps):
    """Analytic LayerNorm gradient (f32), shared by both beta variants."""
    xhat, rstd = _ln_residuals(x, gamma, eps)
    gf = g.astype(jnp.float32)
    dxhat = gf * gamma.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    axes = tuple(range(x.ndim - 1))
    dgamma = jnp.sum(gf * xhat, axis=axes).astype(gamma.dtype)
    return dx, dgamma, jnp.sum(gf, axis=axes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_ln_nobeta(x, gamma, eps):
    return _ln_forward(x, gamma, None, eps)


def _fln_nb_fwd(x, gamma, eps):
    return _ln_forward(x, gamma, None, eps), (x, gamma)


def _fln_nb_bwd(eps, res, g):
    x, gamma = res
    dx, dgamma, _ = _ln_backward(x, gamma, g, eps)
    return dx, dgamma


_fused_ln_nobeta.defvjp(_fln_nb_fwd, _fln_nb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_ln_beta(x, gamma, beta, eps):
    return _ln_forward(x, gamma, beta, eps)


def _fln_b_fwd(x, gamma, beta, eps):
    return _ln_forward(x, gamma, beta, eps), (x, gamma, beta)


def _fln_b_bwd(eps, res, g):
    x, gamma, beta = res
    dx, dgamma, dbeta = _ln_backward(x, gamma, g, eps)
    return dx, dgamma, dbeta.astype(beta.dtype)


_fused_ln_beta.defvjp(_fln_b_fwd, _fln_b_bwd)


def fused_layer_norm(x: jax.Array, gamma: jax.Array,
                     beta: Optional[jax.Array] = None,
                     eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis; single fused VMEM pass on TPU.

    Falls back to the plain XLA formula off-TPU (the interpreter would
    slow CPU test runs) and for feature dims that don't tile the 128-wide
    lane layout.
    """
    C = x.shape[-1]
    n_rows = 1
    for d in x.shape[:-1]:
        n_rows *= d
    if (jax.default_backend() != "tpu" or C % 128 != 0 or C > 8192
            or n_rows < _BLOCK_ROWS):
        return _xla_layer_norm(x, gamma, beta, eps)
    if beta is None:
        return _fused_ln_nobeta(x, gamma, eps)
    return _fused_ln_beta(x, gamma, beta, eps)
