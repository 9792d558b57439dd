"""Pallas flash attention for TPU with causal + sliding-window masking.

The one custom kernel the rebuild needs (SURVEY.md §7 hard-parts #2): the
reference leans on flash-attn/FlexAttention CUDA kernels for long
self-attention and TAAE sliding windows ([63,64]/[31,32]); here it's a
mask-mod-parameterized Pallas kernel.

Design: grid over (batch*heads, q blocks); K/V live in VMEM per (b,h) slice;
online-softmax accumulation over K blocks via fori_loop, with block-range
skipping derived from the causal/window geometry (blocks fully outside the
window are never touched). The forward also emits the per-row logsumexp so
the backward can recompute probabilities in two Pallas kernels (dQ over
q-blocks; dK/dV over k-blocks) without materializing the attention matrix —
the same flash-attention-2 recurrence the reference gets from its CUDA
kernels.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _q_visible_range(qi, block_q, block_k, seq_len, causal, w_left, w_right):
    """K-block range visible from q-block qi. Returns (banded, lo, n_vis, hi):
    banded → iterate lo+i for i in range(n_vis) (STATIC trip count, so Mosaic
    can pipeline); else iterate [lo, hi)."""
    q_start = qi * block_q
    n_blocks = pl.cdiv(seq_len, block_k)
    banded = w_left >= 0 and (causal or w_right >= 0)
    if banded:
        right = 0 if causal else w_right
        n_vis = (w_left + right + block_q - 1) // block_k + 2
        n_vis = min(n_vis, -(-seq_len // block_k))
        lo = jnp.clip((q_start - w_left) // block_k, 0, n_blocks - n_vis)
        return True, lo, n_vis, None
    if causal or w_right >= 0:
        extra = 0 if causal else w_right
        lo = 0
        hi = jnp.minimum((q_start + block_q - 1 + extra) // block_k + 1, n_blocks)
    elif w_left >= 0:
        lo = jnp.maximum((q_start - w_left) // block_k, 0)
        hi = n_blocks
    else:
        lo, hi = 0, n_blocks
    return False, lo, None, hi


def _k_visible_range(ki, block_q, block_k, n_q_blocks, seq_len, causal,
                     w_left, w_right):
    """Transposed band: q-block range that sees k-block ki (for dK/dV)."""
    k_start = ki * block_k
    banded = w_left >= 0 and (causal or w_right >= 0)
    right = 0 if causal else max(w_right, 0)
    if banded:
        n_vis = (w_left + right + block_k - 1) // block_q + 2
        n_vis = min(n_vis, n_q_blocks)
        lo = jnp.clip((k_start - right) // block_q, 0, n_q_blocks - n_vis)
        return True, lo, n_vis, None
    if causal or w_right >= 0:
        # q >= k - right → lower bound
        lo = jnp.maximum((k_start - right) // block_q, 0)
        hi = n_q_blocks
    elif w_left >= 0:
        # q <= k + w_left → upper bound
        lo = 0
        hi = jnp.minimum(
            (k_start + block_k - 1 + w_left) // block_q + 1, n_q_blocks
        )
    else:
        lo, hi = 0, n_q_blocks
    return False, lo, None, hi


def _pow2(x: float) -> bool:
    """True when x is an exact power of two (bf16 multiply is then exact)."""
    m, _ = math.frexp(x)
    return x > 0 and m == 0.5


def _run_kblocks(body, lo, hi, carry):
    """fori_loop over k-blocks [lo, hi), partially unrolled when the bounds
    are static. Unrolling lets Mosaic software-pipeline the MXU matmuls
    against the VPU softmax across k-blocks — measured ~-15..20% on the
    long-N forward (8.81 -> 7.25 ms at [2,24,6144,64] with the NHD pair
    kernel). FULL unroll keeps every iteration's f32 logits live and blows
    the 16 MiB scoped-VMEM stack, so group by the largest divisor <= 4."""
    unroll = 0
    if isinstance(lo, int) and isinstance(hi, int):
        for u in (4, 3, 2):
            if (hi - lo) % u == 0 and hi - lo > u:
                unroll = u
                break
    if not unroll:
        return jax.lax.fori_loop(lo, hi, body, carry)

    def group_body(g, c):
        for j in range(unroll):
            c = body(lo + g * unroll + j, c)
        return c

    return jax.lax.fori_loop(0, (hi - lo) // unroll, group_body, carry)


def _pos_mask(q_start, k_start, block_q, block_k, seq_len, causal,
              w_left, w_right):
    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = k_ids < seq_len
    if causal:
        mask &= k_ids <= q_ids
    if w_left >= 0:
        mask &= k_ids >= q_ids - w_left
    if w_right >= 0:
        mask &= k_ids <= q_ids + w_right
    return mask


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_q, block_k,
                  seq_len, causal, w_left, w_right, scale, no_mask=False):
    qi = pl.program_id(1)
    q = q_ref[0]  # [block_q, D] — keep input dtype (bf16 operands on the MXU)
    # power-of-two scales (dh=64 -> 1/8) fold into q EXACTLY in bf16 (pure
    # exponent shift), saving the per-logit scale multiply — ~10% of the
    # VPU softmax cost that bounds long-N forward time
    if _pow2(scale):
        q = (q * q.dtype.type(scale)).astype(q.dtype)
        scale = 1.0
    D = q.shape[-1]
    q_start = qi * block_q

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        # bf16 operands, f32 accumulation on the MXU
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        if scale != 1.0:
            logits = logits * scale
        if not no_mask:
            mask = _pos_mask(q_start, kb * block_k, block_q, block_k, seq_len,
                             causal, w_left, w_right)
            logits = jnp.where(mask, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)  # f32
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    banded, lo, n_vis, hi = _q_visible_range(
        qi, block_q, block_k, seq_len, causal, w_left, w_right
    )
    if banded:
        acc, m, l = jax.lax.fori_loop(
            0, n_vis, lambda i, c: body(lo + i, c), (acc0, m0, l0)
        )
    else:
        acc, m, l = _run_kblocks(body, lo, hi, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # [block_q, 1]


def _flash_prefix_kernel(q_ref, k_ref, v_ref, kp_ref, vp_ref, o_ref, lse_ref,
                         *, block_q, block_k, seq_len, prefix_len, scale,
                         no_mask=False):
    """Non-causal flash forward over the main sequence with a short prefix
    K/V folded into the online-softmax accumulator as one extra (masked)
    block — the merge never leaves VMEM, unlike the XLA-side lse merge it
    replaces (which cost ~120us/layer in f32 elementwise passes at SA-Open
    shape). kp/vp are [1, P_pad, D] with valid rows < prefix_len."""
    qi = pl.program_id(1)
    q = q_ref[0]  # [block_q, D]
    # fold power-of-two scales into q exactly (see _flash_kernel)
    if _pow2(scale):
        q = (q * q.dtype.type(scale)).astype(q.dtype)
        scale = 1.0
    D = q.shape[-1]
    q_start = qi * block_q

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        if scale != 1.0:
            logits = logits * scale
        if not no_mask:
            mask = _pos_mask(q_start, kb * block_k, block_q, block_k, seq_len,
                             False, -1, -1)
            logits = jnp.where(mask, logits, NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = _run_kblocks(body, 0, pl.cdiv(seq_len, block_k), (acc0, m0, l0))

    # prefix block: [block_q, P_pad] logits, pad columns masked out
    kp = kp_ref[0]  # [P_pad, D]
    vp = vp_ref[0]
    s_p = jnp.dot(q, kp.T, preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s_p.shape, 1)
    s_p = jnp.where(col < prefix_len, s_p, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s_p, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s_p - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.dot(
        p.astype(vp.dtype), vp, preferred_element_type=jnp.float32
    )
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m_new + jnp.log(l)


def _flash_forward_pk(q, k, v, kp, vp, prefix_len, block_q=512, block_k=512):
    """Flash forward over main q/k/v [B,H,Nm,D] + prefix kp/vp [B,H,P,D]
    folded in-kernel. Returns (out [B,H,Nm,D], lse [B*H, Nm_pad, 1])."""
    B, H, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    if N % 1024 == 0:
        block_q, block_k = max(block_q, 1024), max(block_k, 1024)
    block_q, block_k, N_pad = _pick_blocks(N, False, -1, -1, block_q, block_k)
    qf = _pad_seq(q, N_pad).reshape(B * H, N_pad, D)
    kf = _pad_seq(k, N_pad).reshape(B * H, N_pad, D)
    vf = _pad_seq(v, N_pad).reshape(B * H, N_pad, D)
    P = kp.shape[2]
    P_pad = 128  # one lane tile; prefix_split_profitable caps P at 64
    assert P <= P_pad, (
        f"flash_attention_prefix supports prefix_len <= {P_pad}, got {P}; "
        "use flash_attention on the full sequence instead")
    kpf = _pad_seq(kp, P_pad).reshape(B * H, P_pad, D)
    vpf = _pad_seq(vp, P_pad).reshape(B * H, P_pad, D)

    kernel = functools.partial(
        _flash_prefix_kernel, block_q=block_q, block_k=block_k, seq_len=N,
        prefix_len=P, scale=scale, no_mask=N_pad == N,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(B * H, N_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, N_pad, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf, kpf, vpf)
    out = out.reshape(B, H, N_pad, D)[:, :, :N, :]
    return out, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref, *,
                   block_q, block_k, seq_len, causal, w_left, w_right, scale):
    qi = pl.program_id(1)
    q = q_ref[0]           # [bq, D]
    do = do_ref[0]         # [bq, D]
    lse = lse_ref[0]   # [bq, 1] f32
    dsum = dsum_ref[0]  # [bq, 1] f32 — rowsum(dO * O)
    q_start = qi * block_q
    D = q.shape[-1]

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        mask = _pos_mask(q_start, kb * block_k, block_q, block_k, seq_len,
                         causal, w_left, w_right)
        p = jnp.where(mask, jnp.exp(logits - lse), 0.0)  # normalized probs
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dsum) * scale
        return dq + jnp.dot(ds.astype(k_blk.dtype), k_blk,
                            preferred_element_type=jnp.float32)

    dq0 = jnp.zeros((block_q, D), jnp.float32)
    banded, lo, n_vis, hi = _q_visible_range(
        qi, block_q, block_k, seq_len, causal, w_left, w_right
    )
    if banded:
        dq = jax.lax.fori_loop(0, n_vis, lambda i, c: body(lo + i, c), dq0)
    else:
        dq = jax.lax.fori_loop(lo, hi, body, dq0)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                    dk_ref, dv_ref, *, block_q, block_k, seq_len, n_q_blocks,
                    causal, w_left, w_right, scale):
    ki = pl.program_id(1)
    k_blk = k_ref[0]  # [bk, D]
    v_blk = v_ref[0]
    k_start = ki * block_k
    D = k_blk.shape[-1]

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :]
        dsum = dsum_ref[0, pl.ds(qb * block_q, block_q), :]
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        mask = _pos_mask(qb * block_q, k_start, block_q, block_k, seq_len,
                         causal, w_left, w_right)
        p = jnp.where(mask, jnp.exp(logits - lse), 0.0)  # [bq, bk]
        dv = dv + jnp.dot(p.astype(do.dtype).T, do,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dsum) * scale
        dk = dk + jnp.dot(ds.astype(q.dtype).T, q,
                          preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((block_k, D), jnp.float32)
    dv0 = jnp.zeros((block_k, D), jnp.float32)
    banded, lo, n_vis, hi = _k_visible_range(
        ki, block_q, block_k, n_q_blocks, seq_len, causal, w_left, w_right
    )
    if banded:
        dk, dv = jax.lax.fori_loop(
            0, n_vis, lambda i, c: body(lo + i, c), (dk0, dv0)
        )
    else:
        dk, dv = jax.lax.fori_loop(lo, hi, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                      dq_ref, dk_ref, dv_ref, *, block_q, block_k, seq_len,
                      n_q_blocks, causal, w_left, w_right, scale,
                      no_mask=False):
    """Single-pass FA2 backward: grid over k-blocks; dK/dV are block-local
    accumulators and dQ accumulates into a revisited fp32 output block that
    stays VMEM-resident across the k-grid (TPU grids run sequentially per
    core, so the read-modify-write is race-free). 5 N²D matmuls vs 7 for the
    two-pass split, and Q/dO/lse stream from HBM once instead of twice."""
    ki = pl.program_id(1)
    k_blk = k_ref[0]  # [bk, D]
    v_blk = v_ref[0]
    k_start = ki * block_k
    D = k_blk.shape[-1]

    @pl.when(ki == 0)
    def _zero_dq():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :]
        dsum = dsum_ref[0, pl.ds(qb * block_q, block_q), :]
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(logits - lse)
        if not no_mask:
            mask = _pos_mask(qb * block_q, k_start, block_q, block_k, seq_len,
                             causal, w_left, w_right)
            p = jnp.where(mask, p, 0.0)  # [bq, bk]
        dv = dv + jnp.dot(p.astype(do.dtype).T, do,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dsum) * scale
        dk = dk + jnp.dot(ds.astype(q.dtype).T, q,
                          preferred_element_type=jnp.float32)
        sl = pl.ds(qb * block_q, block_q)
        dq_ref[0, sl, :] += jnp.dot(ds.astype(k_blk.dtype), k_blk,
                                    preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((block_k, D), jnp.float32)
    dv0 = jnp.zeros((block_k, D), jnp.float32)
    banded, lo, n_vis, hi = _k_visible_range(
        ki, block_q, block_k, n_q_blocks, seq_len, causal, w_left, w_right
    )
    if banded:
        dk, dv = jax.lax.fori_loop(
            0, n_vis, lambda i, c: body(lo + i, c), (dk0, dv0)
        )
    else:
        dk, dv = jax.lax.fori_loop(lo, hi, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pick_blocks(N, causal, w_left, w_right, block_q=256, block_k=256):
    if w_left >= 0 and (causal or w_right >= 0):
        # narrow band: smaller blocks keep the visible-block count tight
        extent = w_left + (0 if causal else max(w_right, 0))
        block_q = block_k = max(128, min(block_q, 1 << (extent).bit_length()))
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    N_pad = ((N + block_q - 1) // block_q) * block_q
    N_pad = ((N_pad + block_k - 1) // block_k) * block_k
    return block_q, block_k, N_pad


def _pad_seq(x, N_pad):
    N = x.shape[2]
    if N_pad == N:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, N_pad - N), (0, 0)))


def _flash_forward(q, k, v, causal, window, block_q=512, block_k=512):
    B, H, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    w_left, w_right = (-1, -1) if window is None else window
    if not causal and window is None and N % 1024 == 0:
        # unmasked + block-aligned: 1024-point blocks quarter the program
        # count; measured 341 -> 279 us at [48,1024,64] on v5e (the forward
        # is grid-dispatch-bound at DiT sizes, not MXU-bound)
        block_q, block_k = max(block_q, 1024), max(block_k, 1024)
    block_q, block_k, N_pad = _pick_blocks(N, causal, w_left, w_right,
                                           block_q, block_k)
    qf = _pad_seq(q, N_pad).reshape(B * H, N_pad, D)
    kf = _pad_seq(k, N_pad).reshape(B * H, N_pad, D)
    vf = _pad_seq(v, N_pad).reshape(B * H, N_pad, D)

    no_mask = (not causal) and w_left < 0 and w_right < 0 and N_pad == N
    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, seq_len=N,
        causal=causal, w_left=w_left, w_right=w_right, scale=scale,
        no_mask=no_mask,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(B * H, N_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, N_pad, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",  # CPU CI runs interpreted
    )(qf, kf, vf)
    out = out.reshape(B, H, N_pad, D)[:, :, :N, :]
    return out, lse  # lse stays flat/padded: [B*H, N_pad, 1]


def _pad_lse(lse_flat, N, causal, window, block_q=512, block_k=512):
    """Re-pad a [B*H, N, 1] lse to the padded length _flash_backward's full
    BlockSpecs read. Zero-pad rows are harmless: dO is zero there, so their
    dK/dV contributions vanish and their dQ rows are sliced away."""
    w_left, w_right = (-1, -1) if window is None else window
    _, _, n_pad = _pick_blocks(N, causal, w_left, w_right, block_q, block_k)
    if n_pad != N:
        lse_flat = jnp.pad(lse_flat, ((0, 0), (0, n_pad - N), (0, 0)))
    return lse_flat


def _flash_backward(q, k, v, o, lse, g, causal, window,
                    block_q=512, block_k=512, fused=True):
    B, H, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    w_left, w_right = (-1, -1) if window is None else window
    block_q, block_k, N_pad = _pick_blocks(N, causal, w_left, w_right,
                                           block_q, block_k)
    # the fused single-pass kernel holds full-length q/do/lse/dsum blocks
    # plus an fp32 dq accumulator in VMEM; past ~8 MiB of resident blocks
    # fall back to the blocked two-pass kernels (long sliding-window seqs)
    fused_bytes = N_pad * D * (4 + 2 * q.dtype.itemsize) + 12 * N_pad
    if fused and fused_bytes > 8 * 2 ** 20:
        fused = False
    qf = _pad_seq(q, N_pad).reshape(B * H, N_pad, D)
    kf = _pad_seq(k, N_pad).reshape(B * H, N_pad, D)
    vf = _pad_seq(v, N_pad).reshape(B * H, N_pad, D)
    dof = _pad_seq(g, N_pad).reshape(B * H, N_pad, D)
    # rowsum(dO * O): padded rows are zero because g is zero-padded
    dsum = jnp.sum(
        _pad_seq(g, N_pad).astype(jnp.float32) *
        _pad_seq(o, N_pad).astype(jnp.float32), axis=-1, keepdims=True,
    ).reshape(B * H, N_pad, 1)

    interp = jax.default_backend() != "tpu"
    no_mask = (not causal) and w_left < 0 and w_right < 0 and N_pad == N
    common = dict(block_q=block_q, block_k=block_k, seq_len=N, causal=causal,
                  w_left=w_left, w_right=w_right, scale=scale)

    full = lambda b, i: (b, 0, 0)
    unflat = lambda x: x.reshape(B, H, N_pad, D)[:, :, :N, :]

    if fused:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, n_q_blocks=N_pad // block_q,
                              no_mask=no_mask, **common),
            grid=(B * H, N_pad // block_k),
            in_specs=[
                pl.BlockSpec((1, N_pad, D), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_pad, D), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_pad, 1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_pad, 1), full, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                # dq is revisited across the k-grid: fp32 accumulator block
                pl.BlockSpec((1, N_pad, D), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B * H, N_pad, D), jnp.float32),
                jax.ShapeDtypeStruct((B * H, N_pad, D), k.dtype),
                jax.ShapeDtypeStruct((B * H, N_pad, D), v.dtype),
            ],
            interpret=interp,
        )(qf, kf, vf, dof, lse, dsum)
        return unflat(dq).astype(q.dtype), unflat(dk), unflat(dv)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(B * H, N_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N_pad, D), q.dtype),
        interpret=interp,
    )(qf, kf, vf, dof, lse, dsum)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, n_q_blocks=N_pad // block_q,
                          **common),
        grid=(B * H, N_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, N_pad, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, 1), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, N_pad, D), v.dtype),
        ],
        interpret=interp,
    )(qf, kf, vf, dof, lse, dsum)

    unflat = lambda x: x.reshape(B, H, N_pad, D)[:, :, :N, :]
    return unflat(dq), unflat(dk), unflat(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, causal: bool = False,
                    window: Optional[Tuple[int, int]] = None):
    """q,k,v: [B, H, N, D]. Pallas flash-attention forward AND backward."""
    out, _ = _flash_forward(q, k, v, causal, window)
    return out


def _fwd(q, k, v, causal, window):
    out, lse = _flash_forward(q, k, v, causal, window)
    return out, (q, k, v, out, lse)


def _bwd(causal, window, res, g):
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, o, lse, g, causal, window)


flash_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Prefix-split entry: short prepended prefix + block-aligned main sequence
# ---------------------------------------------------------------------------
#
# DiT-style transformers prepend a handful of tokens (global-cond token,
# prepend_cond, memory tokens) to a block-friendly latent sequence: SA-Open
# runs self-attention at N = 1 + 1024. The block grid quantizes to 512-token
# tiles, so that ONE extra token pads the grid from 2x2 to 3x3 block pairs —
# 2.25x the attention work (measured exactly 2x wall on v5e: 0.59 -> 1.17 ms
# at [2,24,N,64]). Splitting recovers the clean grid: flash over the
# (N - P) main tokens, then fold the P prefix keys into the result with the
# streaming-softmax merge (exp(lse) is the main partition function), and do
# the P prefix query rows densely. Exact same math as full attention modulo
# fp reassociation.


def prefix_split_profitable(n: int, prefix_len: int) -> bool:
    """True when the split shrinks the padded block grid (static helper)."""
    if prefix_len <= 0 or prefix_len >= n:
        return False
    if prefix_len > 64:
        # the dense prefix correction is O(N*P); only worth it for short
        # prefixes (typical: 1-17 tokens of global/prepend/memory cond)
        return False
    _, _, n_pad_full = _pick_blocks(n, False, -1, -1, 512, 512)
    _, _, n_pad_main = _pick_blocks(n - prefix_len, False, -1, -1, 512, 512)
    return n_pad_main < n_pad_full


def _prefix_forward(q, k, v, prefix_len):
    B, H, N, D = q.shape
    P = prefix_len
    Nm = N - P
    scale = 1.0 / math.sqrt(D)
    q_m, k_m, v_m = q[:, :, P:], k[:, :, P:], v[:, :, P:]
    # prefix keys fold into the main rows' online softmax INSIDE the kernel
    # (one extra [block_q, 128] masked block per program) — lse comes back as
    # the full-problem logsumexp, so the padded full-length backward applies
    out_main, lse_flat = _flash_forward_pk(
        q_m, k_m, v_m, k[:, :, :P], v[:, :, :P], P
    )
    lse_main = lse_flat.reshape(B, H, -1, 1)[:, :, :Nm]  # [B,H,Nm,1] f32
    # prefix query rows: dense softmax over all N keys (P is tiny). bf16
    # operands with f32 accumulation — same precision as the kernel's MXU
    # path, and no full-size f32 materialization of k/v.
    logits_q = jnp.einsum(
        "bhpd,bhnd->bhpn", q[:, :, :P], k,
        preferred_element_type=jnp.float32) * scale
    m_q = jnp.max(logits_q, axis=-1, keepdims=True)
    e_q = jnp.exp(logits_q - m_q)
    l_q = jnp.sum(e_q, axis=-1, keepdims=True)
    out_pref = (jnp.einsum(
        "bhpn,bhnd->bhpd", e_q.astype(v.dtype), v,
        preferred_element_type=jnp.float32) / l_q).astype(q.dtype)
    lse_pref = m_q + jnp.log(l_q)
    out = jnp.concatenate([out_pref, out_main], axis=2)
    lse = jnp.concatenate([lse_pref, lse_main], axis=2)  # [B,H,N,1], full-row
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_prefix(q, k, v, prefix_len: int):
    """Non-causal, unwindowed self-attention [B,H,N,D] where the first
    `prefix_len` tokens are a short prepended prefix. Numerically the same
    attention as `flash_attention(q, k, v)`; see the module comment."""
    out, _ = _prefix_forward(q, k, v, prefix_len)
    return out


def _prefix_fwd(q, k, v, prefix_len):
    out, lse = _prefix_forward(q, k, v, prefix_len)
    return out, (q, k, v, out, lse)


def _prefix_bwd(prefix_len, res, g):
    # the merged lse equals the full-problem lse, so the standard full-length
    # backward applies unchanged (fwd keeps the 2x win; bwd cost is as before)
    q, k, v, o, lse = res
    B, H, N, _ = q.shape
    lse_flat = _pad_lse(lse.reshape(B * H, N, 1), N, False, None)
    return _flash_backward(q, k, v, o, lse_flat, g, False, None)


flash_attention_prefix.defvjp(_prefix_fwd, _prefix_bwd)


# ---------------------------------------------------------------------------
# Head-pair (NHD) entry: attention straight off the [B, N, H*dh] activation
# layout with block-diagonal-packed K/V
# ---------------------------------------------------------------------------
#
# The standard entry needs q/k/v as [B, H, N, D]: three physical
# [B,N,H*D] -> [B,H,N,D] HBM transposes in, one out — 2.2 ms/step at
# SA-Open scale (in-sampler trace, docs/performance.md), linearly worse at
# seq 6144. This entry reads head PAIRS as 128-lane column blocks of the
# projection's natural [B, N, H*dh] activation layout (dh=64 → two heads
# per 128-lane tile, which is exactly Mosaic's lane width: no relayouts,
# no padding waste) and writes the output back in the same layout, feeding
# the out-projection directly. Zero transposes end to end.
#
# The second win is MXU depth: dh=64 contractions run the 128-deep
# systolic array at half depth — the "dh=64 MXU ceiling" the step profile
# keeps hitting. Packing the pair's K (and V) into a BLOCK-DIAGONAL
# [2*block_k, 128] operand makes both heads' logits ONE full-depth matmul
#   [q_a | q_b] @ [[k_a, 0], [0, k_b]]^T = [q_a k_a^T | q_b k_b^T]
# (the zero blocks guarantee no cross-head mixing), and both heads' P·V
# ONE full-depth matmul with the transposed block layout — the same MACs
# the MXU would idle through anyway, now all useful. Per-head online
# softmax runs on the [block_q, block_k] column halves, which are
# lane-tile-aligned slices (block_k % 128 == 0) — free in Mosaic.
# K'/V' tiles are built IN-KERNEL from the natural [block_k, 128] pair
# tile with two lane masks + a sublane concat (vector cost ~1/block_q of
# the matmul they feed), so K/V VMEM residency matches the standard kernel.


def _flash_nhd_pair_kernel(q_ref, k_ref, v_ref, kp_ref, vp_ref,
                           o_ref, lse_ref, *, block_q, block_k, seq_len,
                           prefix_len, causal, scale, dh, no_mask=False):
    """One program = one (batch, head-pair, q-block). q_ref block is
    [block_q, 128] = [q_a | q_b]; k/v are the pair's keys/values in the
    same natural lane layout ([N_pad, 128] = [k_a | k_b]); kp/vp the
    prefix rows ([P_pad, 128]); prefix_len == 0 skips that block. The
    block-diagonal K'/V' tiles are built in-kernel from the natural tiles
    with two lane masks + a sublane concat (vector cost ~1/block_q of the
    matmul they feed), so K/V VMEM residency matches the standard kernel."""
    qi = pl.program_id(1)
    q2 = q_ref[0]  # [block_q, 128]
    # fold power-of-two scales into q exactly (see _flash_kernel)
    if _pow2(scale):
        q2 = (q2 * q2.dtype.type(scale)).astype(q2.dtype)
        scale = 1.0
    q_start = qi * block_q

    def merge_half(logits_h, k_start_h, m_prev, l_prev):
        if not no_mask:
            mask = _pos_mask(q_start, k_start_h, block_q, block_k, seq_len,
                             causal, -1, -1)
            logits_h = jnp.where(mask, logits_h, NEG_INF)
        m_cur = jnp.max(logits_h, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits_h - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return p, alpha, m_new, l_new

    lane_a_q = jax.lax.broadcasted_iota(jnp.int32, (block_q, 2 * dh), 1) < dh
    lane_a_k = jax.lax.broadcasted_iota(jnp.int32, (block_k, 2 * dh), 1) < dh

    def blockdiag(t, lane_a):
        # [rows, 128] = [t_a | t_b] -> [[t_a, 0], [0, t_b]] [2*rows, 128]
        zero = jnp.zeros_like(t)
        return jnp.concatenate(
            [jnp.where(lane_a, t, zero), jnp.where(lane_a, zero, t)], axis=0)

    def body(kb, carry):
        acc, m_a, l_a, m_b, l_b = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        kd_blk = blockdiag(k_blk, lane_a_k)
        # ONE full-depth matmul for both heads' logits
        logits = jnp.dot(q2, kd_blk.T,
                         preferred_element_type=jnp.float32)
        if scale != 1.0:
            logits = logits * scale
        p_a, alpha_a, m_a, l_a = merge_half(
            logits[:, :block_k], kb * block_k, m_a, l_a)
        p_b, alpha_b, m_b, l_b = merge_half(
            logits[:, block_k:], kb * block_k, m_b, l_b)
        p = jnp.concatenate([p_a, p_b], axis=1)  # [bq, 2bk], tile-aligned
        alpha_l = jnp.where(lane_a_q, alpha_a, alpha_b)
        # ONE full-depth matmul for both heads' P.V (block-diag V')
        vd_blk = blockdiag(v_blk, lane_a_k)
        acc = acc * alpha_l + jnp.dot(
            p.astype(vd_blk.dtype), vd_blk,
            preferred_element_type=jnp.float32)
        return acc, m_a, l_a, m_b, l_b

    acc0 = jnp.zeros((block_q, 2 * dh), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    banded, lo, n_vis, hi = _q_visible_range(
        qi, block_q, block_k, seq_len, causal, -1, -1
    )
    acc, m_a, l_a, m_b, l_b = _run_kblocks(
        body, lo, hi, (acc0, m0, l0, m0, l0))

    if prefix_len > 0:
        # prefix block: [block_q, 2*P_pad] logits, pad columns masked
        kp = kp_ref[0]  # [P_pad, 128] natural pair layout
        vp = vp_ref[0]
        P_pad = kp.shape[0]
        lane_a_p = jax.lax.broadcasted_iota(
            jnp.int32, (P_pad, 2 * dh), 1) < dh
        s_p = jnp.dot(q2, blockdiag(kp, lane_a_p).T,
                      preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, P_pad), 1)
        pmask = col < prefix_len
        sa = jnp.where(pmask, s_p[:, :P_pad], NEG_INF)
        sb = jnp.where(pmask, s_p[:, P_pad:], NEG_INF)
        m_a_new = jnp.maximum(m_a, jnp.max(sa, axis=-1, keepdims=True))
        m_b_new = jnp.maximum(m_b, jnp.max(sb, axis=-1, keepdims=True))
        alpha_a = jnp.exp(m_a - m_a_new)
        alpha_b = jnp.exp(m_b - m_b_new)
        p_a = jnp.exp(sa - m_a_new)
        p_b = jnp.exp(sb - m_b_new)
        l_a = l_a * alpha_a + jnp.sum(p_a, axis=-1, keepdims=True)
        l_b = l_b * alpha_b + jnp.sum(p_b, axis=-1, keepdims=True)
        p = jnp.concatenate([p_a, p_b], axis=1)
        alpha_l = jnp.where(lane_a_q, alpha_a, alpha_b)
        acc = acc * alpha_l + jnp.dot(
            p.astype(vp.dtype), blockdiag(vp, lane_a_p),
            preferred_element_type=jnp.float32)
        m_a, m_b = m_a_new, m_b_new

    l_a = jnp.maximum(l_a, 1e-30)
    l_b = jnp.maximum(l_b, 1e-30)
    l_lane = jnp.where(lane_a_q, l_a, l_b)
    o_ref[0] = (acc / l_lane).astype(o_ref.dtype)
    lse_ref[0] = jnp.concatenate(
        [m_a + jnp.log(l_a), m_b + jnp.log(l_b)], axis=1)  # [block_q, 2]


def _nhd_flat(x, P, N_pad):
    """[B, N, H, dh] -> main rows as [B, N_pad, H*dh] (reshape + pad only)."""
    B, N, H, dh = x.shape
    xm = x[:, P:].reshape(B, N - P, H * dh)
    if N_pad != N - P:
        xm = jnp.pad(xm, ((0, 0), (0, N_pad - (N - P)), (0, 0)))
    return xm


def _nhd_forward(q, k, v, causal, prefix_len, block_q=512, block_k=512):
    """q,k,v: [B, N, H, dh] with dh*2 == 128. Returns (out [B, N, H, dh],
    lse [B*Hp, N_pad, 2])."""
    B, N, H, dh = q.shape
    assert 2 * dh == 128 and H % 2 == 0
    assert prefix_len == 0 or not causal, "prefix fold is non-causal"
    Hp = H // 2
    scale = 1.0 / math.sqrt(dh)
    P = prefix_len
    Nm = N - P
    # NOTE: no 1024-block bump here — the pair kernel's logits tile is
    # [block_q, 2*block_k] f32 (8 MiB at 1024/1024), which blows the 16 MiB
    # scoped-VMEM limit once the resident K/V and accumulators are added.
    # Measured sweep on v5e ([2,24,N,64], prefix 1): narrow-q/wide-k wins —
    # (256,512) at short N (0.89 vs 0.95 ms at 1k), (256,1024) at long N
    # (7.25 vs 8.81 ms at 6k; wider k-blocks amortize the per-block online-
    # softmax merges the long-N forward is bound by)
    if block_q == 512 and block_k == 512 and not causal:
        block_q, block_k = (256, 1024) if Nm >= 4096 else (256, 512)
    block_q, block_k, N_pad = _pick_blocks(Nm, causal, -1, -1,
                                           block_q, block_k)
    # all operands stay in the natural activation layout (reshape + pad)
    qm = _nhd_flat(q, P, N_pad)
    km = _nhd_flat(k, P, N_pad)
    vm = _nhd_flat(v, P, N_pad)
    P_pad = 128
    if P > 0:
        assert P <= P_pad
        kp = _nhd_flat(k[:, :P], 0, P_pad)
        vp = _nhd_flat(v[:, :P], 0, P_pad)
    else:
        kp = jnp.zeros((B, P_pad, H * dh), q.dtype)
        vp = jnp.zeros((B, P_pad, H * dh), q.dtype)

    no_mask = (not causal) and N_pad == Nm
    kernel = functools.partial(
        _flash_nhd_pair_kernel, block_q=block_q, block_k=block_k,
        seq_len=Nm, prefix_len=P, causal=causal, scale=scale, dh=dh,
        no_mask=no_mask,
    )

    def pair_spec(rows):
        return pl.BlockSpec(
            (1, rows, 2 * dh), lambda bh, i, Hp=Hp: (bh // Hp, 0, bh % Hp),
            memory_space=pltpu.VMEM)

    out, lse = pl.pallas_call(
        kernel,
        grid=(B * Hp, N_pad // block_q),
        in_specs=[
            # q block: the pair's 128 lanes, straight from [B, N, H*dh]
            pl.BlockSpec((1, block_q, 2 * dh),
                         lambda bh, i, Hp=Hp: (bh // Hp, i, bh % Hp),
                         memory_space=pltpu.VMEM),
            pair_spec(N_pad),
            pair_spec(N_pad),
            pair_spec(P_pad),
            pair_spec(P_pad),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, 2 * dh),
                         lambda bh, i, Hp=Hp: (bh // Hp, i, bh % Hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 2), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N_pad, H * dh), q.dtype),
            jax.ShapeDtypeStruct((B * Hp, N_pad, 2), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qm, km, vm, kp, vp)
    out_main = out[:, :Nm].reshape(B, Nm, H, dh)

    if P > 0:
        # prefix query rows: dense softmax over all N keys (P is tiny),
        # computed in the NHD layout via einsum over the head axis
        logits_q = jnp.einsum(
            "bphd,bnhd->bhpn", q[:, :P], k,
            preferred_element_type=jnp.float32) * scale
        m_q = jnp.max(logits_q, axis=-1, keepdims=True)
        e_q = jnp.exp(logits_q - m_q)
        l_q = jnp.sum(e_q, axis=-1, keepdims=True)
        out_pref = (jnp.einsum(
            "bhpn,bnhd->bphd", e_q.astype(v.dtype), v,
            preferred_element_type=jnp.float32) / l_q.transpose(0, 2, 1, 3)
        ).astype(q.dtype)
        out_full = jnp.concatenate([out_pref, out_main], axis=1)
        lse_pref = (m_q + jnp.log(l_q))  # [B, H, P, 1]
    else:
        out_full = out_main
        lse_pref = None
    return out_full, (lse, lse_pref)


def _nhd_lse_to_bhn(lse_pair, lse_pref, B, H, N, prefix_len):
    """Merge kernel lse [B*Hp, N_pad, 2] + prefix lse [B, H, P, 1] into the
    [B*H, N_pad_full, 1] layout _flash_backward reads."""
    Hp = H // 2
    Nm = N - prefix_len
    lse_main = lse_pair.reshape(B, Hp, -1, 2)[:, :, :Nm]  # [B, Hp, Nm, 2]
    lse_main = lse_main.transpose(0, 1, 3, 2).reshape(B, H, Nm, 1)
    if prefix_len > 0:
        lse_full = jnp.concatenate([lse_pref, lse_main], axis=2)
    else:
        lse_full = lse_main
    return _pad_lse(lse_full.reshape(B * H, N, 1), N, False, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_nhd(q, k, v, causal: bool = False, prefix_len: int = 0):
    """Self-attention over [B, N, H, dh] (dh=64, H even) WITHOUT the
    [B,N,H*dh]→[B,H,N,dh] transposes: head pairs are 128-lane column tiles
    and the pair's matmuls run full-depth via block-diagonal K/V packing
    (see the section comment). `prefix_len` folds a short prepended prefix
    (global-cond/prepend/memory tokens) like flash_attention_prefix.
    Returns [B, N, H, dh]."""
    out, _ = _nhd_forward(q, k, v, causal, prefix_len)
    return out


def _nhd_fwd(q, k, v, causal, prefix_len):
    out, (lse_pair, lse_pref) = _nhd_forward(q, k, v, causal, prefix_len)
    return out, (q, k, v, out, lse_pair, lse_pref)


def _nhd_bwd(causal, prefix_len, res, g):
    # the merged lse equals the full-problem lse; transpose to the standard
    # layout and reuse the fused full-length backward (transposes are paid
    # only on the training backward — the forward stays transpose-free)
    q, k, v, o, lse_pair, lse_pref = res
    B, N, H, dh = q.shape
    to_bhnd = lambda t: t.transpose(0, 2, 1, 3)
    lse = _nhd_lse_to_bhn(lse_pair, lse_pref, B, H, N, prefix_len)
    dq, dk, dv = _flash_backward(
        to_bhnd(q), to_bhnd(k), to_bhnd(v), to_bhnd(o), lse, to_bhnd(g),
        causal if prefix_len == 0 else False, None,
    )
    back = lambda t: t.transpose(0, 2, 1, 3)
    return back(dq), back(dk), back(dv)


flash_attention_nhd.defvjp(_nhd_fwd, _nhd_bwd)


# ---------------------------------------------------------------------------
# Fused-QKV entry: attention straight off the interleaved projection output
# ---------------------------------------------------------------------------
#
# The TP-friendly fused projection layout ([B, N, H, 3, dh], see
# ops/attention.py) would need a physical shuffle to produce contiguous
# q/k/v tensors for the standard kernel (pallas call boundaries materialize
# their inputs). The kernel's BlockSpec index maps instead read q/k/v blocks
# directly out of the fused tensor — zero rearrangement passes — and apply
# the (partial, half-split) rotary embedding in-kernel in fp32.
#
# STATUS: correct (values+grads tested vs the XLA reference) but measured
# SLOWER than the standard split path on real v5e at the SA-Open DiT shape
# (dh=64): Mosaic tiles the trailing (3, 64) block dims to (8, 128), so the
# per-head q/k/v panels carry ~4x VMEM padding and every in-loop plane read
# pays a relayout (self-attn 0.51 -> 1.77 ms/layer end-to-end). With dh=64
# no per-head lane packing satisfies the 128-lane tiling without a physical
# transpose, which is exactly what this path exists to avoid — so the
# Attention module does NOT dispatch here; kept as an experimental entry
# for dh=128 models and future Mosaic tiling improvements.


def _flash_fused_kernel(qkv_q_ref, qkv_kv_ref, cos_ref, sin_ref,
                        o_ref, lse_ref, *, block_q, block_k, seq_len, causal,
                        w_left, w_right, scale, rot_dim, no_mask=False):
    qi = pl.program_id(2)
    q_start = qi * block_q

    def rope(t, start, rows):
        if rot_dim == 0:
            return t
        c = cos_ref[pl.ds(start, rows), :]
        s = sin_ref[pl.ds(start, rows), :]
        tf = t.astype(jnp.float32)
        t_rot, t_pass = tf[:, :rot_dim], tf[:, rot_dim:]
        h1, h2 = t_rot[:, : rot_dim // 2], t_rot[:, rot_dim // 2:]
        rotated = jnp.concatenate([-h2, h1], axis=-1)
        t_rot = t_rot * c + rotated * s
        return jnp.concatenate([t_rot, t_pass], axis=-1).astype(t.dtype)

    # the q/k/v plane dim (3) is blocked FULLY — Mosaic requires the last
    # two block dims divisible by (8, 128) or equal to the array dims, so a
    # singleton block on the plane axis cannot lower; plane selection
    # happens here instead
    q = rope(qkv_q_ref[0, :, 0, 0, :], q_start, block_q)  # [block_q, dh]
    D = q.shape[-1]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = rope(qkv_kv_ref[0, pl.ds(kb * block_k, block_k), 0, 1, :],
                     kb * block_k, block_k)
        v_blk = qkv_kv_ref[0, pl.ds(kb * block_k, block_k), 0, 2, :]
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        if not no_mask:
            mask = _pos_mask(q_start, kb * block_k, block_q, block_k, seq_len,
                             causal, w_left, w_right)
            logits = jnp.where(mask, logits, NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    banded, lo, n_vis, hi = _q_visible_range(
        qi, block_q, block_k, seq_len, causal, w_left, w_right
    )
    if banded:
        acc, m, l = jax.lax.fori_loop(
            0, n_vis, lambda i, c: body(lo + i, c), (acc0, m0, l0)
        )
    else:
        acc, m, l = _run_kblocks(body, lo, hi, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)


def _fused_forward(qkv, cos, sin, causal, window, block_q=512, block_k=512):
    B, N, H, three, D = qkv.shape
    assert three == 3
    scale = 1.0 / math.sqrt(D)
    w_left, w_right = (-1, -1) if window is None else window
    block_q, block_k, N_pad = _pick_blocks(N, causal, w_left, w_right,
                                           block_q, block_k)
    if N_pad != N:
        # pad the seq axis; padded keys are masked via k_ids < seq_len and
        # padded query rows are sliced away below (same scheme as the
        # standard forward)
        qkv = jnp.pad(qkv, ((0, 0), (0, N_pad - N), (0, 0), (0, 0), (0, 0)))
    rot_dim = 0 if cos is None else cos.shape[-1]
    if cos is None:
        cos = jnp.zeros((N_pad, 1), jnp.float32)
        sin = jnp.zeros((N_pad, 1), jnp.float32)
    elif N_pad != N:
        cos = jnp.pad(cos, ((0, N_pad - N), (0, 0)))
        sin = jnp.pad(sin, ((0, N_pad - N), (0, 0)))
    no_mask = (not causal) and w_left < 0 and w_right < 0 and N_pad == N

    kernel = functools.partial(
        _flash_fused_kernel, block_q=block_q, block_k=block_k, seq_len=N,
        causal=causal, w_left=w_left, w_right=w_right, scale=scale,
        rot_dim=rot_dim, no_mask=no_mask,
    )
    qspec = pl.BlockSpec((1, block_q, 1, 3, D), lambda b, h, i: (b, i, h, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, N_pad, 1, 3, D), lambda b, h, i: (b, 0, h, 0, 0),
                          memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(cos.shape, lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, H, N_pad // block_q),
        in_specs=[qspec, kvspec, tspec, tspec],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N_pad, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, H, N_pad, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qkv, qkv, cos, sin)
    return out[:, :, :N, :], lse[:, :, :N].reshape(B * H, N, 1)


def _fused_unpack_rope(qkv, cos, sin):
    """Reference unpack+rope (pure jax) — used only for the backward."""
    q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)  # [B, H, N, dh]
    k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)
    if cos is not None:
        rot = cos.shape[-1]

        def rope(t):
            tf = t.astype(jnp.float32)
            t_rot, t_pass = tf[..., :rot], tf[..., rot:]
            h1, h2 = t_rot[..., : rot // 2], t_rot[..., rot // 2:]
            rotated = jnp.concatenate([-h2, h1], axis=-1)
            t_rot = t_rot * cos + rotated * sin
            return jnp.concatenate([t_rot, t_pass], axis=-1).astype(t.dtype)

        q, k = rope(q), rope(k)
    return q, k, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_fused_qkv(qkv, cos, sin, causal: bool = False,
                              window: Optional[Tuple[int, int]] = None):
    """qkv: [B, N, H, 3, dh] interleaved fused projection; cos/sin: [N, rot]
    rotary tables (or None). Returns [B, H, N, dh]."""
    out, _ = _fused_forward(qkv, cos, sin, causal, window)
    return out


def _fused_fwd(qkv, cos, sin, causal, window):
    out, lse = _fused_forward(qkv, cos, sin, causal, window)
    return out, (qkv, cos, sin, out, lse)


def _fused_bwd(causal, window, res, g):
    qkv, cos, sin, out, lse = res
    # cheap elementwise unpack+rope re-run; the heavy matmul backward reuses
    # the fused single-pass kernel on the unpacked tensors. lse comes back
    # sliced to N — re-pad it to the padded-length BlockSpec the backward
    # reads (undefined pad rows would otherwise poison dK/dV with inf*0).
    N = qkv.shape[1]
    lse = _pad_lse(lse, N, causal, window)
    if cos is None:
        (q, k, v), vjp_unpack = jax.vjp(
            lambda qkv: _fused_unpack_rope(qkv, None, None), qkv
        )
        dq, dk, dv = _flash_backward(q, k, v, out, lse, g, causal, window)
        (dqkv,) = vjp_unpack((dq, dk, dv))
        return dqkv, None, None
    (q, k, v), vjp_unpack = jax.vjp(_fused_unpack_rope, qkv, cos, sin)
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g, causal, window)
    return vjp_unpack((dq, dk, dv))


flash_attention_fused_qkv.defvjp(_fused_fwd, _fused_bwd)
