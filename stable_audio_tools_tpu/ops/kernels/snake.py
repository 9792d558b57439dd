"""Pallas fused snake-beta activation for TPU.

XLA splits the fast-sin2 snake's forward/backward chains into several
loop fusions with f32 intermediates materialized between them (and a
separate layout copy feeding each dalpha/dbeta reduce) — measured ~34
ms/pair of the SA-2.0 VAE GAN step even with an analytic custom VJP,
vs a ~12 ms memory roofline. This kernel does the whole thing in VMEM:

- forward: read x (bf16), evaluate the period-pi range-reduced cos
  polynomial (ops/activations.py::_COS_POLY), write out — one pass.
- backward: read x and the cotangent, write dx plus per-grid-block
  [1, C] partial sums for dalpha/dbeta (f32, accumulated by a tiny XLA
  sum over the ~R/block partials) — one pass, no full-size f32
  residuals.

Semantics identical to ops.activations._snake_fast (same polynomials,
same f32 math, same 1e-9 beta epsilon); parity is pinned by
tests/test_ops_conv.py::test_snake_fused_pallas_matches_jnp.
Reference op: stable_audio_tools/models/blocks.py:290-328.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _horner(coefs, v):
    c = jnp.float32(coefs[-1])
    for coef in coefs[-2::-1]:
        c = c * v + jnp.float32(coef)
    return c


def _polys():
    from ..activations import _COS_POLY, _DCOS_POLY

    return _COS_POLY, _DCOS_POLY


def _block_rows(C: int) -> int:
    # keep the f32 working set ~64k elements so Mosaic double-buffers in VMEM
    r = max(1, 65536 // C) * 8
    return max(8, min(512, r))


def _fwd_kernel(x_ref, a_ref, b_ref, o_ref):
    cos_poly, _ = _polys()
    xf = x_ref[...].astype(jnp.float32)
    a = a_ref[...].astype(jnp.float32)
    binv = 1.0 / (b_ref[...].astype(jnp.float32) + 1e-9)
    u = (xf * a) * jnp.float32(1.0 / math.pi)
    t = u - jnp.floor(u) - jnp.float32(0.5)
    v = (t * t) * jnp.float32(4.0)
    s2 = (jnp.float32(1.0) + _horner(cos_poly, v)) * jnp.float32(0.5)
    o_ref[...] = (xf + binv * s2).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, a_ref, b_ref, dx_ref, pa_ref, pb_ref, *,
                n_rows, block_rows):
    cos_poly, dcos_poly = _polys()
    xf = x_ref[...].astype(jnp.float32)
    gf = g_ref[...].astype(jnp.float32)
    a = a_ref[...].astype(jnp.float32)
    binv = 1.0 / (b_ref[...].astype(jnp.float32) + 1e-9)
    u = (xf * a) * jnp.float32(1.0 / math.pi)
    t = u - jnp.floor(u) - jnp.float32(0.5)
    v = (t * t) * jnp.float32(4.0)
    s2 = (jnp.float32(1.0) + _horner(cos_poly, v)) * jnp.float32(0.5)
    ds2 = jnp.float32(4.0 / math.pi) * t * _horner(dcos_poly, v)
    dx_ref[...] = (gf * (1.0 + (a * binv) * ds2)).astype(dx_ref.dtype)
    # tail-block rows past n_rows hold junk (their dx stores are dropped by
    # Pallas, but the partial sums must exclude them explicitly)
    i = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0) + i * block_rows
    live = row < n_rows
    # jnp.where (not multiply-by-0): junk tail rows can hold inf/NaN and
    # 0*NaN would poison the sums
    zero = jnp.float32(0.0)
    C = xf.shape[-1]
    # partials as [8, C] (Mosaic requires >=(8,128) output blocks): reduce
    # row groups of 8; the final (nblk*8, C) -> [C] sum is a tiny XLA reduce
    pa = jnp.where(live, gf * xf * binv * ds2, zero)
    pb = jnp.where(live, -gf * s2 * (binv * binv), zero)
    pa_ref[...] = jnp.sum(pa.reshape(-1, 8, C), axis=0)[None]
    pb_ref[...] = jnp.sum(pb.reshape(-1, 8, C), axis=0)[None]


def _fwd(x, alpha, beta):
    shape = x.shape
    C = shape[-1]
    xf = x.reshape(-1, C)
    R = xf.shape[0]
    rows = _block_rows(C)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(pl.cdiv(R, rows),),
        in_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xf, alpha.reshape(1, C), beta.reshape(1, C))
    return out.reshape(shape)


def _bwd(x, alpha, beta, g):
    shape = x.shape
    C = shape[-1]
    xf = x.reshape(-1, C)
    gf = g.reshape(-1, C)
    R = xf.shape[0]
    rows = _block_rows(C)
    nblk = pl.cdiv(R, rows)
    dx, pa, pb = pl.pallas_call(
        functools.partial(_bwd_kernel, n_rows=R, block_rows=rows),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), x.dtype),
            jax.ShapeDtypeStruct((nblk, 8, C), jnp.float32),
            jax.ShapeDtypeStruct((nblk, 8, C), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xf, gf, alpha.reshape(1, C), beta.reshape(1, C))
    dalpha = jnp.sum(pa, axis=(0, 1)).astype(alpha.dtype)
    dbeta = jnp.sum(pb, axis=(0, 1)).astype(beta.dtype)
    return dx.reshape(shape), dalpha, dbeta


@jax.custom_vjp
def snake_fused(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """snake_beta(x, alpha, beta) = x + sin^2(alpha*x)/(beta+1e-9), fused."""
    return _fwd(x, alpha, beta)


def _snake_fused_fwd(x, alpha, beta):
    return _fwd(x, alpha, beta), (x, alpha, beta)


def _snake_fused_bwd(res, g):
    x, alpha, beta = res
    return _bwd(x, alpha, beta, g)


snake_fused.defvjp(_snake_fused_fwd, _snake_fused_bwd)


def snake_fused_supported(x: jax.Array) -> bool:
    C = x.shape[-1]
    n_rows = 1
    for d in x.shape[:-1]:
        n_rows *= d
    return (jax.default_backend() == "tpu" and C % 128 == 0 and C <= 8192
            and n_rows >= 8)
