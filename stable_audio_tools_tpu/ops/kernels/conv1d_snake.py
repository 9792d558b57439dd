"""Fused snake-beta → conv1d Pallas kernel for TPU.

Every Oobleck/DAC codec conv is preceded by a per-channel snake activation
(reference: stable_audio_tools/models/autoencoders.py:97-153). Run as
separate XLA ops, the snake is a serialized VPU pass (the MXU idles) plus a
full HBM round-trip of the activations; measured ~16 ms of the SA-2.0 GAN
train-step pair. This kernel computes

    y = conv1d(snake_beta(x, alpha, beta), W) + bias        (stride 1, NLC)

in one pass: each grid step loads two consecutive [BL, Ci] blocks of x into
VMEM (the second provides the (k-1)*d halo), evaluates the fast-sin2 snake
polynomial on the VPU, and accumulates the k tap matmuls on the MXU — the
VPU work hides under the MXU pipeline and the snake intermediate never
touches HBM.

The backward is a custom VJP:
- dx: same windowed structure over dy with the flipped/io-swapped kernel,
  multiplied in-VMEM by snake'(x), emitting per-block [8, Ci] partial sums
  for dalpha/dbeta (summed by a tiny XLA reduce) — one pass, no
  materialized f32 residuals.
- dW: snake(x) is recomputed by the Pallas snake forward and contracted
  with dy by the tap-sliced matmul form (ops/conv.py::_conv1d_s1_bwd).

Semantics match ops.activations._snake_fast ∘ ops.conv.conv1d exactly
(same polynomial, f32 accumulation); parity pinned by
tests/test_conv1d_snake.py. Zero padding commutes with the fusion because
snake(0) = 0.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .snake import _fwd as _snake_fwd, _horner, _polys

_ENABLED = os.environ.get("SAT_FUSED_SNAKE_CONV", "1") != "0"

_BL = 512  # minimum stream block (support checks assume >= this)
# weights + double-buffered x/dy blocks + f32 accumulators must fit VMEM
# (~16 MB); 4 MB of bf16 weights leaves comfortable headroom
_MAX_W_BYTES = 4 * 1024 * 1024


def _pick_bl(ci: int, co: int) -> int:
    """Stream block length for the dgrad kernel: the largest power-of-two
    block whose double-buffered in/out tiles fit the VMEM budget. (In-situ
    the kernels run ~0.29 ms per audio-rate call — near compute-bound;
    a chained microbench that suggested a 0.6 ms per-call floor was a
    serial-dependency artifact.)"""
    bl = 4096
    while bl > 512 and bl * (2 * ci + co) * 2 * 2 > 8 * 1024 * 1024:
        bl //= 2
    return bl


def _snake_f32(xf, a, binv):
    cos_poly, _ = _polys()
    u = (xf * a) * jnp.float32(1.0 / math.pi)
    t = u - jnp.floor(u) - jnp.float32(0.5)
    v = (t * t) * jnp.float32(4.0)
    s2 = (jnp.float32(1.0) + _horner(cos_poly, v)) * jnp.float32(0.5)
    return xf + binv * s2


def _snake_window(x0_ref, x1_ref, a, binv, pad_lo, n_x, blk_id):
    """snake(x) over the concatenated [2*bl] block window, with rows outside
    the valid x range [pad_lo, pad_lo+n_x) (conv zero padding + block
    round-up) forced to EXACT zero. Unfused, padding is applied after the
    activation and contributes exactly 0; the fast-sin2 polynomial at x=0 is
    only ~0 (≈4e-11·binv), which diverges at boundary taps if beta is tiny."""
    xw = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0).astype(jnp.float32)
    sx = _snake_f32(xw, a, binv)
    bl = x0_ref.shape[1]
    row = (jax.lax.broadcasted_iota(jnp.int32, xw.shape, 0) + blk_id * bl)
    live = (row >= pad_lo) & (row < pad_lo + n_x)
    return jnp.where(live, sx, jnp.float32(0.0)).astype(x0_ref.dtype)


def _fwd_kernel(x0_ref, x1_ref, w_ref, a_ref, b_ref, bias_ref, o_ref, *, k, d,
                pad_lo, n_x, s):
    a = a_ref[...].astype(jnp.float32)
    binv = 1.0 / (b_ref[...].astype(jnp.float32) + 1e-9)
    sx = _snake_window(x0_ref, x1_ref, a, binv, pad_lo, n_x,
                       pl.program_id(1))
    bl = x0_ref.shape[1]
    acc = jnp.zeros((bl, w_ref.shape[-1]), jnp.float32)
    for j in range(k):
        acc += jax.lax.dot_general(
            jax.lax.slice_in_dim(sx, s + j * d, s + j * d + bl, axis=0),
            w_ref[j],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc += bias_ref[...].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _fwd_kernel_res(x0_ref, x1_ref, w_ref, a_ref, b_ref, bias_ref, res_ref,
                    o_ref, *, k, d, pad_lo, n_x, s):
    """_fwd_kernel + fused residual epilogue: o = conv(snake(x)) + res.
    Saves the separate audio-rate residual-add HBM pass of every codec
    ResidualUnit (measured ~2.4 ms per [1,2M,128] add in the SA-Open
    decode trace; the Pallas call boundary kept XLA from fusing it)."""
    a = a_ref[...].astype(jnp.float32)
    binv = 1.0 / (b_ref[...].astype(jnp.float32) + 1e-9)
    sx = _snake_window(x0_ref, x1_ref, a, binv, pad_lo, n_x,
                       pl.program_id(1))
    bl = x0_ref.shape[1]
    acc = jnp.zeros((bl, w_ref.shape[-1]), jnp.float32)
    for j in range(k):
        acc += jax.lax.dot_general(
            jax.lax.slice_in_dim(sx, s + j * d, s + j * d + bl, axis=0),
            w_ref[j],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc += bias_ref[...].astype(jnp.float32)
    acc += res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


_CARRY = os.environ.get("SAT_SNAKE_CARRY", "0") == "1"


def _fwd_kernel_carry(x_ref, w_ref, a_ref, b_ref, bias_ref, o_ref,
                      carry_ref, *, k, d, pad_lo, n_x, s, n_co):
    """Single-read forward: the two-BlockSpec halo streams every x block
    TWICE from HBM (~40% extra traffic). Here the grid runs one extra step
    per batch row; each step computes output block i-1 from the VMEM-
    carried previous block + the freshly streamed block i, then saves
    block i into the carry scratch (TPU grids are sequential, so the
    carry is race-free). Opt-in via SAT_SNAKE_CARRY=1 pending A/B."""
    i = pl.program_id(1)
    co = pl.program_id(2)

    @pl.when(i > 0)
    def _compute():
        a = a_ref[...].astype(jnp.float32)
        binv = 1.0 / (b_ref[...].astype(jnp.float32) + 1e-9)
        bl = x_ref.shape[1]
        xw = jnp.concatenate([carry_ref[...], x_ref[0]],
                             axis=0).astype(jnp.float32)
        sx = _snake_f32(xw, a, binv)
        row = (jax.lax.broadcasted_iota(jnp.int32, xw.shape, 0)
               + (i - 1) * bl)
        live = (row >= pad_lo) & (row < pad_lo + n_x)
        sx = jnp.where(live, sx, jnp.float32(0.0)).astype(x_ref.dtype)
        acc = jnp.zeros((bl, w_ref.shape[-1]), jnp.float32)
        for j in range(k):
            acc += jax.lax.dot_general(
                jax.lax.slice_in_dim(sx, s + j * d, s + j * d + bl, axis=0),
                w_ref[j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc += bias_ref[...].astype(jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)

    @pl.when(co == n_co - 1)
    def _save():
        carry_ref[...] = x_ref[0]


def _run_fwd_carry(xp, kernel, alpha, beta, bias, B, Lout, bl, cob,
                   nblk, lo_a, s_off, L, k, d, interpret):
    Ci = xp.shape[-1]
    Co = kernel.shape[-1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_carry, k=k, d=d, pad_lo=lo_a, n_x=L,
                          s=s_off, n_co=Co // cob),
        grid=(B, nblk + 1, Co // cob),
        in_specs=[
            pl.BlockSpec((1, bl, Ci), lambda b, i, co: (b, i, 0)),
            pl.BlockSpec((k, Ci, cob), lambda b, i, co: (0, 0, co)),
            pl.BlockSpec((1, Ci), lambda b, i, co: (0, 0)),
            pl.BlockSpec((1, Ci), lambda b, i, co: (0, 0)),
            pl.BlockSpec((1, cob), lambda b, i, co: (0, co)),
        ],
        out_specs=pl.BlockSpec(
            (1, bl, cob),
            lambda b, i, co: (b, jnp.maximum(i - 1, 0), co)),
        out_shape=jax.ShapeDtypeStruct((B, nblk * bl, Co), xp.dtype),
        scratch_shapes=[pltpu.VMEM((bl, Ci), xp.dtype)],
        interpret=interpret,
    )(xp, kernel, alpha.reshape(1, Ci), beta.reshape(1, Ci),
      bias.reshape(1, Co))
    return out[:, :Lout]


def _bwd_dx_kernel(dy0_ref, dy1_ref, x_ref, wT_ref, a_ref, b_ref,
                   dx_ref, pa_ref, pb_ref, *, k, d, n_rows, s):
    cos_poly, dcos_poly = _polys()
    a = a_ref[...].astype(jnp.float32)
    binv = 1.0 / (b_ref[...].astype(jnp.float32) + 1e-9)
    dyw = jnp.concatenate([dy0_ref[0], dy1_ref[0]], axis=0)
    bl = dy0_ref.shape[1]
    acc = jnp.zeros((bl, wT_ref.shape[-1]), jnp.float32)
    for j in range(k):
        acc += jax.lax.dot_general(
            jax.lax.slice_in_dim(dyw, s + j * d, s + j * d + bl, axis=0),
            wT_ref[j],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # acc = d(loss)/d(snake_out); chain through the snake
    xf = x_ref[0].astype(jnp.float32)
    u = (xf * a) * jnp.float32(1.0 / math.pi)
    t = u - jnp.floor(u) - jnp.float32(0.5)
    v = (t * t) * jnp.float32(4.0)
    s2 = (jnp.float32(1.0) + _horner(cos_poly, v)) * jnp.float32(0.5)
    ds2 = jnp.float32(4.0 / math.pi) * t * _horner(dcos_poly, v)
    dx_ref[0] = (acc * (1.0 + (a * binv) * ds2)).astype(dx_ref.dtype)
    # per-block dalpha/dbeta partials; junk tail rows (>= n_rows in the
    # last L block) are masked — their pb term is only ~0 to poly accuracy
    row = (jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0)
           + pl.program_id(1) * bl)
    live = row < n_rows
    zero = jnp.float32(0.0)
    C = xf.shape[-1]
    pa = jnp.where(live, acc * xf * binv * ds2, zero)
    pb = jnp.where(live, -acc * s2 * (binv * binv), zero)
    pa_ref[0, 0] = jnp.sum(pa.reshape(-1, 8, C), axis=0)
    pb_ref[0, 0] = jnp.sum(pb.reshape(-1, 8, C), axis=0)


def _pad_rows(x, lo, total):
    B, L, C = x.shape
    return jax.lax.pad(
        x, jnp.zeros((), x.dtype), [(0, 0, 0), (lo, total - L - lo, 0), (0, 0, 0)]
    )


def _aligned_lo(lo: int):
    """Round a left row-pad up to the 8-sublane tile so lax.pad is a
    tile-ALIGNED copy (a 1-3 row shift relayouts the whole tensor: ~14 ms
    of the round-5 GAN-pair trace). The kernels absorb the surplus as a
    static in-VMEM window offset s = lo_a - lo (cheap vector shift)."""
    lo_a = -(-lo // 8) * 8
    return lo_a, lo_a - lo


# ---------------------------------------------------------------------------
# Weight gradient: dW[j,ci,co] = sum_{b,i} snake(x)[b, j*d + i, ci] dy[b,i,co]
#
# The tap-sliced matmul form (ops/conv.py::_conv1d_s1_bwd) re-reads the
# activation (and dy) from HBM once PER TAP — k=7 means 14 full passes, and
# the snake path pays an extra recompute pass; measured 33.9 TF/s in the
# GAN-step trace. This kernel streams x and dy through VMEM ONCE and keeps
# the whole [k, Ci, CoB] f32 accumulator resident across the (batch, length)
# grid, evaluating the snake on the VPU under the MXU taps. dbias falls out
# of the same dy block for free.
# ---------------------------------------------------------------------------

# f32 accumulator budget; Co is block-split (CoB) until the accumulator fits
_MAX_ACC_BYTES = 6 * 1024 * 1024


def _pick_cob(k: int, ci: int, co: int) -> Optional[int]:
    cob = co
    while cob >= 128 and k * ci * cob * 4 > _MAX_ACC_BYTES:
        cob //= 2
    if cob < 128 or co % cob:
        return None
    return cob


def _bwd_dw_body(x0_ref, x1_ref, dy_ref, dw_ref, db_ref, *, k, d, s,
                 a=None, binv=None, pad_lo=0, n_x=0):
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    if a is not None:
        # same exact-zero padding-row mask as the forward (see _snake_window)
        sx = _snake_window(x0_ref, x1_ref, a, binv, pad_lo, n_x,
                           pl.program_id(2))
    else:
        sx = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0)
    dy = dy_ref[0]
    bl = dy_ref.shape[1]
    for j in range(k):
        dw_ref[j] += jax.lax.dot_general(
            jax.lax.slice_in_dim(sx, s + j * d, s + j * d + bl, axis=0),
            dy,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    db_ref[0] += jnp.sum(dy.astype(jnp.float32), axis=0)


def _bwd_dw_kernel_snake(x0_ref, x1_ref, dy_ref, a_ref, b_ref, dw_ref,
                         db_ref, *, k, d, s, pad_lo, n_x):
    a = a_ref[...].astype(jnp.float32)
    binv = 1.0 / (b_ref[...].astype(jnp.float32) + 1e-9)
    _bwd_dw_body(x0_ref, x1_ref, dy_ref, dw_ref, db_ref, k=k, d=d, s=s,
                 a=a, binv=binv, pad_lo=pad_lo, n_x=n_x)


def _bwd_dw_kernel_plain(x0_ref, x1_ref, dy_ref, dw_ref, db_ref, *, k, d, s):
    _bwd_dw_body(x0_ref, x1_ref, dy_ref, dw_ref, db_ref, k=k, d=d, s=s)


def _wgrad_bl(ci: int) -> int:
    # larger stream blocks for narrow channels (same per-grid-cell overhead
    # argument as _pick_bl); the dw accumulator stays resident so the
    # budget is tighter than the fwd/dgrad kernels'
    if ci <= 128:
        return 2048
    if ci <= 256:
        return 1024
    return _BL if ci <= 512 else _BL // 2


def wgrad_kernel_supported(k: int, ci: int, co: int, d: int,
                           l_out: int) -> bool:
    if not _ENABLED or ci % 128 or co % 128:
        return False
    if (k - 1) * d + 7 > _wgrad_bl(ci):
        return False
    return _pick_cob(k, ci, co) is not None and l_out >= 8


def _run_bwd_dw(dy, x, kernel_shape, pre_snake, pad_lo, pad_hi, d, interpret):
    """Returns (dW f32 [k, Ci, Co], dbias f32 [Co])."""
    k, Ci, Co = kernel_shape
    B, L, _ = x.shape
    Lout = dy.shape[1]
    bl = _wgrad_bl(Ci)
    cob = _pick_cob(k, Ci, Co)
    nblk = pl.cdiv(Lout, bl)
    lo_a, s_off = _aligned_lo(pad_lo)
    xp = _pad_rows(x, lo_a, (nblk + 1) * bl)
    dyp = _pad_rows(dy, 0, nblk * bl)
    x_specs = [
        pl.BlockSpec((1, bl, Ci), lambda co, b, i: (b, i, 0)),
        pl.BlockSpec((1, bl, Ci), lambda co, b, i: (b, i + 1, 0)),
    ]
    dy_spec = pl.BlockSpec((1, bl, cob), lambda co, b, i: (b, i, co))
    out_specs = [
        pl.BlockSpec((k, Ci, cob), lambda co, b, i: (0, 0, co)),
        pl.BlockSpec((1, cob), lambda co, b, i: (0, co)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((k, Ci, Co), jnp.float32),
        jax.ShapeDtypeStruct((1, Co), jnp.float32),
    ]
    if pre_snake is not None:
        alpha, beta = pre_snake
        dw, db = pl.pallas_call(
            functools.partial(_bwd_dw_kernel_snake, k=k, d=d, s=s_off,
                              pad_lo=lo_a, n_x=L),
            grid=(Co // cob, B, nblk),
            in_specs=x_specs + [
                dy_spec,
                pl.BlockSpec((1, Ci), lambda co, b, i: (0, 0)),
                pl.BlockSpec((1, Ci), lambda co, b, i: (0, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(xp, xp, dyp, alpha.reshape(1, Ci), beta.reshape(1, Ci))
    else:
        dw, db = pl.pallas_call(
            functools.partial(_bwd_dw_kernel_plain, k=k, d=d, s=s_off),
            grid=(Co // cob, B, nblk),
            in_specs=x_specs + [dy_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(xp, xp, dyp)
    return dw, db[0]


def conv1d_wgrad(dy, x, kernel_shape, pad_lo, pad_hi, dilation,
                 interpret=None):
    """Plain (no snake) stride-1 conv1d weight gradient, one-pass Pallas.

    Drop-in for the tap-sliced dW in ops/conv.py::_conv1d_s1_bwd when
    `wgrad_kernel_supported` holds. Returns dW f32 [k, Ci, Co].
    """
    if interpret is None:
        interpret = _interpret()
    dw, _ = _run_bwd_dw(dy, x, kernel_shape, None, pad_lo, pad_hi, dilation,
                        interpret)
    return dw


def _run_fwd(x, kernel, bias, alpha, beta, pad_lo, pad_hi, d, interpret,
             residual=None):
    B, L, Ci = x.shape
    k, _, Co = kernel.shape
    E = (k - 1) * d + 1
    Lout = L + pad_lo + pad_hi - E + 1
    plan = _fwd_plan(k, Ci, Co, d, Lout)
    if plan is None:
        # direct callers (tests, explicit use) bypass the efficiency gate
        # in snake_conv1d_supported — run with a minimal valid config
        cob = _fwd_cob(k, Ci, Co) or Co
        bl = 256 if (k - 1) * d + 7 <= 256 else _BL
        plan = (bl, cob)
    bl, cob = plan
    nblk = pl.cdiv(Lout, bl)
    lo_a, s_off = _aligned_lo(pad_lo)
    xp = _pad_rows(x, lo_a, (nblk + 1) * bl)
    if _CARRY and residual is None:
        return _run_fwd_carry(xp, kernel, alpha, beta, bias, B, Lout, bl,
                              cob, nblk, lo_a, s_off, L, k, d, interpret)
    # co innermost: the x blocks' index map ignores co, so Mosaic keeps
    # them resident across the co sweep (weights stream instead)
    in_specs = [
        pl.BlockSpec((1, bl, Ci), lambda b, i, co: (b, i, 0)),
        pl.BlockSpec((1, bl, Ci), lambda b, i, co: (b, i + 1, 0)),
        pl.BlockSpec((k, Ci, cob), lambda b, i, co: (0, 0, co)),
        pl.BlockSpec((1, Ci), lambda b, i, co: (0, 0)),
        pl.BlockSpec((1, Ci), lambda b, i, co: (0, 0)),
        pl.BlockSpec((1, cob), lambda b, i, co: (0, co)),
    ]
    operands = [xp, xp, kernel, alpha.reshape(1, Ci), beta.reshape(1, Ci),
                bias.reshape(1, Co)]
    kern = _fwd_kernel
    if residual is not None:
        kern = _fwd_kernel_res
        in_specs.append(
            pl.BlockSpec((1, bl, cob), lambda b, i, co: (b, i, co)))
        operands.append(_pad_rows(residual, 0, nblk * bl))
    out = pl.pallas_call(
        functools.partial(kern, k=k, d=d, pad_lo=lo_a, n_x=L, s=s_off),
        grid=(B, nblk, Co // cob),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bl, cob), lambda b, i, co: (b, i, co)),
        out_shape=jax.ShapeDtypeStruct((B, nblk * bl, Co), x.dtype),
        interpret=interpret,
    )(*operands)
    return out[:, :Lout]


def _run_bwd_dx(dy, x, kernel, alpha, beta, pad_lo, pad_hi, d, interpret):
    B, L, Ci = x.shape
    k, _, Co = kernel.shape
    E = (k - 1) * d + 1
    bl = _pick_bl(Ci, Co)
    nblk = pl.cdiv(L, bl)
    kT = jnp.flip(kernel, 0).transpose(0, 2, 1)  # [k, Co, Ci]
    lo_a, s_off = _aligned_lo(E - 1 - pad_lo)
    dyp = _pad_rows(dy, lo_a, (nblk + 1) * bl)
    xpad = _pad_rows(x, 0, nblk * bl)
    dx, pa, pb = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, k=k, d=d, n_rows=L, s=s_off),
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, bl, Co), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bl, Co), lambda b, i: (b, i + 1, 0)),
            pl.BlockSpec((1, bl, Ci), lambda b, i: (b, i, 0)),
            pl.BlockSpec((k, Co, Ci), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, Ci), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Ci), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bl, Ci), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, 8, Ci), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 8, Ci), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nblk * bl, Ci), dy.dtype),
            jax.ShapeDtypeStruct((B, nblk, 8, Ci), jnp.float32),
            jax.ShapeDtypeStruct((B, nblk, 8, Ci), jnp.float32),
        ],
        interpret=interpret,
    )(dyp, dyp, xpad, kT, alpha.reshape(1, Ci), beta.reshape(1, Ci))
    dalpha = jnp.sum(pa, axis=(0, 1, 2))
    dbeta = jnp.sum(pb, axis=(0, 1, 2))
    return dx[:, :L], dalpha, dbeta


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def snake_conv1d(x, kernel, bias, alpha, beta, pad_lo, pad_hi, dilation):
    """conv1d(snake_beta(x, alpha, beta), kernel) + bias, fused on TPU.

    x: [B, L, Ci]; kernel: [k, Ci, Co] (WIO); alpha/beta: [Ci] (post-exp,
    i.e. the values snake_beta consumes); bias: [Co]. Stride 1 only.
    """
    return _run_fwd(x, kernel, bias, alpha, beta, pad_lo, pad_hi, dilation,
                    _interpret())


def _snake_conv1d_fwd(x, kernel, bias, alpha, beta, pad_lo, pad_hi, dilation):
    out = _run_fwd(x, kernel, bias, alpha, beta, pad_lo, pad_hi, dilation,
                   _interpret())
    return out, (x, kernel, alpha, beta)


def _snake_conv1d_bwd(pad_lo, pad_hi, dilation, res, dy):
    x, kernel, alpha, beta = res
    k, Ci, Co = kernel.shape
    if k * Ci * Co * 2 > _MAX_W_BYTES:
        # big-channel case (the forward swept Co in blocks): the dgrad
        # kernel would need the full [k, Co, Ci] transposed weights in
        # VMEM. Fall back to XLA's dgrad (full-lane at these widths) and
        # chain through the snake's analytic vjp (the fused snake kernel's
        # own backward — one VMEM pass).
        from ..activations import snake_beta

        sx, snake_pull = jax.vjp(
            lambda x_, a_, b_: snake_beta(x_, a_, b_), x,
            alpha.astype(x.dtype), beta.astype(x.dtype))
        conv = lambda s_: jax.lax.conv_general_dilated(
            s_, kernel, window_strides=(1,), padding=[(pad_lo, pad_hi)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        _, conv_pull = jax.vjp(conv, sx)
        d_sx = conv_pull(dy)[0]
        dx, dalpha, dbeta = snake_pull(d_sx)
    else:
        dx, dalpha, dbeta = _run_bwd_dx(
            dy, x, kernel, alpha, beta, pad_lo, pad_hi, dilation,
            _interpret())
    if wgrad_kernel_supported(k, Ci, Co, dilation, dy.shape[1]):
        # one-pass streaming wgrad: snake recomputed in-VMEM, [k,Ci,CoB]
        # f32 accumulator resident across the (batch, length) grid
        dW, db = _run_bwd_dw(dy, x, (k, Ci, Co), (alpha, beta),
                             pad_lo, pad_hi, dilation, _interpret())
        return (dx, dW.astype(kernel.dtype), db.astype(dy.dtype),
                dalpha.astype(alpha.dtype), dbeta.astype(beta.dtype))
    # fallback: recompute snake(x) (one fused VMEM pass) and contract each
    # tap against dy on the long axis — the tap-sliced weight-gradient form
    B, L, _ = x.shape
    a2 = alpha.reshape(1, Ci).astype(jnp.float32)
    b2 = beta.reshape(1, Ci).astype(jnp.float32)
    if _interpret():
        binv = 1.0 / (b2 + 1e-9)
        sx = _snake_f32(
            x.reshape(-1, Ci).astype(jnp.float32), a2, binv
        ).astype(x.dtype).reshape(x.shape)
    else:
        sx = _snake_fwd(x, alpha.astype(x.dtype), beta.astype(x.dtype))
    sxp = jnp.pad(sx, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    Lout = dy.shape[1]
    dW = jnp.stack(
        [
            jax.lax.dot_general(
                jax.lax.dynamic_slice_in_dim(sxp, j * dilation, Lout, 1),
                dy,
                (((0, 1), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for j in range(k)
        ],
        0,
    ).astype(kernel.dtype)
    dbias = jnp.sum(dy.astype(jnp.float32), axis=(0, 1)).astype(dy.dtype)
    return (dx, dW, dbias, dalpha.astype(alpha.dtype),
            dbeta.astype(beta.dtype))


snake_conv1d.defvjp(_snake_conv1d_fwd, _snake_conv1d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def snake_conv1d_res(x, kernel, bias, alpha, beta, residual,
                     pad_lo, pad_hi, dilation):
    """snake_conv1d with a fused residual epilogue:
    conv1d(snake_beta(x, alpha, beta), kernel) + bias + residual.
    residual: [B, Lout, Co]. The add rides the kernel's VMEM output pass
    (the codec ResidualUnit's `h + x` was a separate audio-rate HBM pass).
    """
    return _run_fwd(x, kernel, bias, alpha, beta, pad_lo, pad_hi, dilation,
                    _interpret(), residual=residual)


def _snake_conv1d_res_fwd(x, kernel, bias, alpha, beta, residual,
                          pad_lo, pad_hi, dilation):
    out = _run_fwd(x, kernel, bias, alpha, beta, pad_lo, pad_hi, dilation,
                   _interpret(), residual=residual)
    # zero-size carrier pins the residual's dtype (a raw np.dtype is not a
    # valid pytree leaf)
    return out, (x, kernel, alpha, beta, residual[:0])


def _snake_conv1d_res_bwd(pad_lo, pad_hi, dilation, saved, dy):
    x, kernel, alpha, beta, res_proto = saved
    dx, dW, db, dalpha, dbeta = _snake_conv1d_bwd(
        pad_lo, pad_hi, dilation, (x, kernel, alpha, beta), dy)
    return dx, dW, db, dalpha, dbeta, dy.astype(res_proto.dtype)


snake_conv1d_res.defvjp(_snake_conv1d_res_fwd, _snake_conv1d_res_bwd)


def _fwd_cob(k: int, ci: int, co: int):
    """Output-channel block for the forward: big-channel convs (7x1024x1024
    is 14.7 MB of bf16 weights, over the VMEM budget) sweep Co in blocks
    while the x blocks stay resident. None if no valid split exists."""
    cob = co
    while cob > 128 and k * ci * cob * 2 > _MAX_W_BYTES:
        cob //= 2
    if k * ci * cob * 2 > _MAX_W_BYTES or co % cob:
        return None
    return cob


def _fwd_plan(k: int, ci: int, co: int, d: int, l_out: int):
    """(bl, cob) for the forward, or None if no configuration fits VMEM.

    Budget model (double-buffered): two [bl, ci] bf16 input block refs,
    the [k, ci, cob] bf16 weight block (streams when co-blocked), the
    [bl, cob] bf16 output block — within ~14 MB of the 16 MB scoped VMEM.
    Catches e.g. the s2d-folded strided convs (ci up to 8192), which must
    keep using the XLA path. Short outputs must roughly fill one block:
    the deep VAE levels (L=16-64 at 1024-2048 ch) padded up to 512-row
    blocks cost up to 30x the real FLOPs (measured +6 ms on the GAN pair)
    — XLA handles tiny-L convs fine."""
    cob = _fwd_cob(k, ci, co)
    if cob is None:
        return None

    # weights double-buffer only when they stream (cob < co); a constant
    # block index stays single-buffered
    w_bufs = 2 if cob < co else 1
    def need(bl):
        return (2 * bl * ci * 2 * 2 + k * ci * cob * 2 * w_bufs
                + bl * cob * 2 * 2)

    bl = 4096
    # bl*ci <= 512K elements: the empirical scoped-VMEM ceiling. The byte
    # model below undercounts Mosaic's f32 snake/accumulator temporaries
    # (measured: k=1 ci=512 bl=2048 allocates 16.34M and fails; bl=1024
    # compiles) — cap at the largest configuration class proven to compile
    # across the round's benches.
    while bl > 256 and (need(bl) > 14 * 1024 * 1024
                        or bl * ci > 512 * 1024
                        or bl > max(l_out, 8)):
        bl //= 2
    if need(bl) > 14 * 1024 * 1024 or (k - 1) * d + 7 > bl:
        return None
    if 2 * l_out < bl:
        return None
    return bl, cob


def snake_conv1d_supported(x, kernel, stride: int, dilation: int,
                           groups: int = 1) -> bool:
    """Dispatch gate: TPU backend (or explicit interpret tests), 128-lane
    channel counts, halo within one block, weights within the VMEM budget."""
    if not _ENABLED or stride != 1 or groups != 1:
        return False
    if jax.default_backend() != "tpu":
        return False
    k, Ci, Co = kernel.shape
    if Ci % 128 or Co % 128:
        return False
    if k * Ci * Co * 2 > _MAX_W_BYTES:
        # Big-channel convs CAN run via the co-swept plan (_fwd_plan), but
        # measured round-5: XLA beats the co-swept kernel at these shapes
        # (GAN pair 165.4 -> 168.9 ms with auto-dispatch; SA-Open decode
        # unchanged). Keep them on the XLA path.
        return False
    if _fwd_plan(k, Ci, Co, dilation, x.shape[1]) is None:
        return False
    # degenerate lengths: the pipeline needs at least one full block
    return x.shape[1] >= 8
