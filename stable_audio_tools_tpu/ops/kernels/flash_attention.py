"""Pallas flash attention for TPU with causal + sliding-window masking.

The one custom kernel the rebuild needs (SURVEY.md §7 hard-parts #2): the
reference leans on flash-attn/FlexAttention CUDA kernels for long
self-attention and TAAE sliding windows ([63,64]/[31,32]); here it's a
mask-mod-parameterized Pallas kernel.

Design: grid over (batch*heads, q blocks); K/V live in VMEM per (b,h) slice;
online-softmax accumulation over K blocks via fori_loop, with block-range
skipping derived from the causal/window geometry (blocks fully outside the
window are never touched). Backward pass recomputes attention in XLA via
custom_vjp — forward speed is what matters for sampling; training grads stay
exact through the XLA path.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_q, block_k, seq_len,
                  causal, w_left, w_right, scale):
    qi = pl.program_id(1)
    q = q_ref[0]  # [block_q, D] — keep input dtype (bf16 operands on the MXU)
    D = q.shape[-1]

    q_start = qi * block_q
    n_blocks = pl.cdiv(seq_len, block_k)
    # K-block range visible from this Q block. Trip count is kept STATIC
    # (so Mosaic can pipeline the loop); only the offset is dynamic.
    banded = w_left >= 0 and (causal or w_right >= 0)
    if banded:
        # fixed number of visible blocks around the diagonal → static trip count
        right = 0 if causal else w_right
        n_vis = (w_left + right + block_q - 1) // block_k + 2
        n_vis = min(n_vis, -(-seq_len // block_k))
        lo = jnp.clip((q_start - w_left) // block_k, 0, n_blocks - n_vis)
        hi = lo + n_vis
    elif causal or w_right >= 0:
        extra = 0 if causal else w_right
        lo = 0
        hi = jnp.minimum((q_start + block_q - 1 + extra) // block_k + 1, n_blocks)
    elif w_left >= 0:
        lo = jnp.maximum((q_start - w_left) // block_k, 0)
        hi = n_blocks
    else:
        lo = 0
        hi = n_blocks

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        # bf16 operands, f32 accumulation on the MXU
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        # mask: positions + causal/window
        q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_ids = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = k_ids < seq_len
        if causal:
            mask &= k_ids <= q_ids
        if w_left >= 0:
            mask &= k_ids >= q_ids - w_left
        if w_right >= 0:
            mask &= k_ids <= q_ids + w_right
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
    if banded:
        # static trip count (pipelineable), dynamic offset
        acc, m, l = jax.lax.fori_loop(
            0, n_vis, lambda i, c: body(lo + i, c), (acc0, m0, l0)
        )
    else:
        acc, m, l = jax.lax.fori_loop(lo, hi, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, causal, window, block_q=256, block_k=256):
    B, H, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    w_left, w_right = (-1, -1) if window is None else window
    if w_left >= 0 and (causal or w_right >= 0):
        # narrow band: smaller blocks keep the visible-block count tight
        extent = w_left + (0 if causal else max(w_right, 0))
        block_q = block_k = max(128, min(block_q, 1 << (extent).bit_length()))
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    # pad N to a multiple of block size
    N_pad = ((N + block_q - 1) // block_q) * block_q
    N_pad = ((N_pad + block_k - 1) // block_k) * block_k
    if N_pad != N:
        pad = N_pad - N
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))

    qf = q.reshape(B * H, N_pad, D)
    kf = k.reshape(B * H, N_pad, D)
    vf = v.reshape(B * H, N_pad, D)

    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, seq_len=N,
        causal=causal, w_left=w_left, w_right=w_right, scale=scale,
    )
    out = pl.pallas_call(
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
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N_pad, D), q.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU CI runs interpreted
    )(qf, kf, vf)
    out = out.reshape(B, H, N_pad, D)
    return out[:, :, :N, :]


def _xla_reference(q, k, v, causal, window):
    from ..attention import dot_product_attention

    return dot_product_attention(q, k, v, causal=causal, window=window)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, causal: bool = False,
                    window: Optional[Tuple[int, int]] = None):
    """q,k,v: [B, H, N, D]. Pallas forward; exact XLA-recompute backward."""
    return _flash_forward(q, k, v, causal, window)


def _fwd(q, k, v, causal, window):
    return _flash_forward(q, k, v, causal, window), (q, k, v)


def _bwd(causal, window, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, causal, window), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
