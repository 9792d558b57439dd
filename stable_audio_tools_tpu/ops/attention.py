"""Attention for TPU.

Capability parity with reference models/transformer.py:328-553 `Attention`:
fused/split QKV, GQA (kv-head repeat), qk-norm (l2 / ln / dyt), partial RoPE
applied in fp32, causal + sliding-window masking, differential attention,
feat_scale DC/HF output modulation.

Backend dispatch: a Pallas flash-attention kernel (ops/kernels/flash_attention.py)
for long self-attention sequences, XLA dot-product attention otherwise. Both are
mask-mod parameterized so sliding windows ([left, right] like flash-attn's
window_size) and causal are the same code path.
"""

from __future__ import annotations

import math
import os
from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .embeddings import apply_rotary_pos_emb, apply_rotary_pos_emb_nhd
from .norms import DynamicTanh


class QuantizableDense(nn.Module):
    """Drop-in nn.Dense (same param names/shapes) that additionally consumes
    an optional `kernel_scale` variable: when present, the stored kernel is
    int8 per-output-channel symmetric-quantized and the matmul reads it as
    `x @ int8→bf16` with the convert fused into the weight stream — half the
    HBM bytes of bf16, the decisive cost of the HBM-bound AR decode scan.
    Quantization happens OUTSIDE the module (models/lm.py, opt-in); without
    a scale this is numerically identical to nn.Dense."""

    features: int
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        out = x @ kernel.astype(x.dtype)
        if self.has_variable("params", "kernel_scale"):
            scale = self.get_variable("params", "kernel_scale")
            out = out * scale.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(x.dtype)
        return out


def quantize_kernel_int8(kernel):
    """Per-output-channel symmetric int8: returns (int8 kernel, f32 scale)."""
    kf = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(kf), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    return jnp.round(kf / scale).astype(jnp.int8), scale


class InterleavedFusedProj(nn.Module):
    """Fused projection stored head-major INTERLEAVED ([h][part][dh] column
    order) applied as n_fused separate matmuls against strided PARAM slices.

    The param layout keeps tensor-parallel tiled shardings aligned (any shard
    count dividing the head count lands every part boundary on a shard
    boundary; see docs/multichip.md), while slicing the *kernel* instead of
    the activation makes the per-step program shuffle-free: the slices are
    loop-invariant (hoisted out of the sampler scan by XLA) and shard-local
    under TP (each device's shard holds its own heads' q/k/v columns), and
    each matmul emits a contiguous [B, N, D] part.

    Exception — KV-cached AR decode (N=1): the decode scan is bound by the
    WEIGHT stream and by fixed per-op overheads (both strided kernel slices
    and strided activation unpacks inside the sequential scan measured
    ~1.5-1.8x slower end-to-end). There the caller pre-permutes the kernel
    to the torch-style CONCAT layout ONCE outside the scan
    (models/lm.py::permute_fused_kernels_to_concat) and passes
    `concat_kernel=True`: one contiguous weight read + contiguous splits,
    zero strided ops per step."""

    features: int  # total fused output width
    n_fused: int
    dim_heads: int

    @nn.compact
    def __call__(self, x, concat_kernel: bool = False,
                 raw_interleaved: bool = False):
        din = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (din, self.features),
            jnp.float32,
        )
        # the concat layout is a property of the VARIABLES, not the call
        # site: only honor it when permute_fused_kernels_to_concat stamped
        # its layout marker (unpermuted variables fall back to the exact
        # interleaved path, just without the contiguous-read speedup)
        if concat_kernel and not self.has_variable("layout", "concat"):
            concat_kernel = False
        # int8 decode kernels are only dequantized on the concat path
        assert concat_kernel or not self.has_variable("params", "kernel_scale"), (
            "int8-quantized kernel reached the interleaved path — apply "
            "permute_fused_kernels_to_concat before quantize_decode_kernels_int8")
        heads = self.features // (self.n_fused * self.dim_heads)
        if raw_interleaved:
            # one matmul, no unpacking: the fused flash kernel reads q/k/v
            # blocks straight out of [B, N, H, n_fused, dh] via BlockSpec
            # index maps (ops/kernels/flash_attention.py)
            proj = x @ kernel.astype(x.dtype)
            b, n = proj.shape[:-1]
            return proj.reshape(b, n, heads, self.n_fused, self.dim_heads)
        if concat_kernel:
            # kernel has been pre-permuted to [q|k|v] concat layout by the
            # caller: contiguous read, contiguous split (+ optional int8
            # weight-only dequant scale, models/lm.py)
            proj = x @ kernel.astype(x.dtype)
            if self.has_variable("params", "kernel_scale"):
                scale = self.get_variable("params", "kernel_scale")
                proj = proj * scale.astype(x.dtype)
            return list(jnp.split(proj, self.n_fused, axis=-1))
        if x.shape[-2] <= 16:
            proj = x @ kernel.astype(x.dtype)  # one contiguous weight read
            b, n = proj.shape[:-1]
            p5 = proj.reshape(b, n, heads, self.n_fused, self.dim_heads)
            return [
                p5[:, :, :, j, :].reshape(b, n, heads * self.dim_heads)
                for j in range(self.n_fused)
            ]
        k4 = kernel.reshape(din, heads, self.n_fused, self.dim_heads)
        parts = []
        for j in range(self.n_fused):
            wj = k4[:, :, j, :].reshape(din, heads * self.dim_heads)
            parts.append(x @ wj.astype(x.dtype))
        return parts


def _build_bias(
    q_len: int,
    k_len: int,
    causal: bool,
    window: Optional[Tuple[int, int]],
    mask: Optional[jax.Array],
    dtype,
) -> Optional[jax.Array]:
    """Additive attention bias encoding causal/sliding-window/key-padding masks.

    window = (left, right): key j visible from query i iff
    i - left <= j <= i + right (flash-attn window_size convention).
    """
    neg = jnp.finfo(jnp.float32).min
    bias = None
    if causal or window is not None:
        qi = jnp.arange(q_len)[:, None]
        kj = jnp.arange(k_len)[None, :]
        # align ends (matches flash-attn when q_len != k_len)
        offset = k_len - q_len
        allowed = jnp.ones((q_len, k_len), dtype=bool)
        if causal:
            allowed &= kj <= qi + offset
        if window is not None:
            left, right = window
            if left >= 0:
                allowed &= kj >= qi + offset - left
            if right >= 0:
                allowed &= kj <= qi + offset + right
        bias = jnp.where(allowed, 0.0, neg)[None, None]  # [1, 1, q, k]
    if mask is not None:
        # mask: [b, k_len] True = attend
        key_bias = jnp.where(mask[:, None, None, :], 0.0, neg)
        bias = key_bias if bias is None else bias + key_bias
    return bias.astype(jnp.float32) if bias is not None else None


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    window: Optional[Tuple[int, int]] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """q,k,v: [b, h, n, d]. Softmax in fp32. Returns [b, h, n, d] in q.dtype."""
    *_, q_len, d = q.shape
    k_len = k.shape[-2]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    bias = _build_bias(q_len, k_len, causal, window, mask, logits.dtype)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    window: Optional[Tuple[int, int]] = None,
    mask: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    prefix_len: int = 0,
) -> jax.Array:
    """Backend dispatch point. q,k,v: [b, h, n, d].

    prefix_len: number of prepended cond/memory tokens at the head of a
    self-attention sequence. When the remaining main sequence is better
    aligned to the flash kernel's block grid than the full length (e.g.
    SA-Open's N = 1 + 1024), dispatches to the prefix-split kernel entry —
    same math, ~2x fewer block pairs."""
    if use_pallas is None:
        use_pallas = _should_use_pallas(q, k, mask)
    if use_pallas:
        try:
            from ..parallel.mesh import in_mesh_program
            from .kernels.flash_attention import (
                flash_attention, flash_attention_prefix,
                prefix_split_profitable,
            )

            wrap = None
            if in_mesh_program():
                wrap, _ = _mesh_attn_shardmap(q.shape[0], q.shape[1], "bhnd")
                if wrap is None:  # mesh can't split this shape; XLA shards fine
                    raise NotImplementedError
            if (prefix_len and not causal and window is None and mask is None
                    and q.shape == k.shape
                    and prefix_split_profitable(q.shape[-2], prefix_len)):
                fn = lambda q, k, v: flash_attention_prefix(q, k, v, prefix_len)
            else:
                fn = lambda q, k, v: flash_attention(
                    q, k, v, causal=causal, window=window)
            return wrap(fn, q, k, v) if wrap is not None else fn(q, k, v)
        except Exception:
            pass
    return dot_product_attention(q, k, v, causal=causal, window=window, mask=mask)


def _mesh_attn_shardmap(batch: int, heads: int, layout: str):
    """shard_map wrapper for running a head-parallel pallas attention kernel
    inside a GSPMD mesh program.

    GSPMD cannot partition a pallas custom-call (it would replicate sharded
    operands), but attention is exactly parallel over (batch, head), so a
    shard_map region with batch on 'data' and heads on 'model' runs the
    kernel per-shard with zero collectives — and under Megatron TP the
    q/k/v projections are already column(=head)-sharded, so no resharding
    is inserted either.

    Returns (wrap, local_heads) where wrap(fn, *arrays) runs fn under
    shard_map, or (None, heads) if the active mesh cannot split this shape
    exactly (caller falls back to XLA SDPA).
    layout: 'bhnd' for [B,H,N,D] kernels, 'bnhd' for the NHD entry."""
    from ..parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is None:
        return None, heads
    dp = mesh.shape.get("data", 1)
    tp = mesh.shape.get("model", 1)
    if batch % dp != 0 or heads % tp != 0:
        return None, heads
    from jax.sharding import PartitionSpec as P

    spec = (P("data", "model", None, None) if layout == "bhnd"
            else P("data", None, "model", None))

    def wrap(fn, *arrays):
        return jax.shard_map(fn, mesh=mesh, in_specs=spec, out_specs=spec,
                             check_vma=False)(*arrays)

    return wrap, heads // tp


def _should_use_nhd(n, h, kv_h, dim_heads, causal, prefix_len, mask,
                    window) -> bool:
    """Gate for the transpose-free head-pair (NHD) flash entry.

    Requires: a head PAIR filling exactly one 128-lane tile (dh=64, even
    head count), self-attention without GQA/window/mask, a prefix only on
    the non-causal path (the kernel's prefix fold is non-causal), sequences
    long enough to beat the XLA path, and bounded K/V VMEM residency (the
    kernel keeps the pair's full K/V rows resident: N*512 B). Mesh programs
    dispatch via shard_map (heads on 'model', batch on 'data') when the
    local head count stays even — see _mesh_attn_shardmap."""
    if os.environ.get("SAT_DISABLE_NHD"):  # A/B escape hatch
        return False
    if mask is not None or window is not None:
        return False
    if dim_heads * 2 != 128 or h % 2 != 0:
        return False
    if kv_h != h and (kv_h <= 0 or h % kv_h != 0):
        return False  # GQA handled by an in-layout K/V repeat; needs h%kv_h==0
    if prefix_len and (causal or prefix_len > 128):
        return False
    if (jax.default_backend() != "tpu"
            and not os.environ.get("SAT_FORCE_PALLAS_ATTN")):
        # SAT_FORCE_PALLAS_ATTN: tests exercise the kernels (interpret
        # mode) and the mesh shard_map dispatch on the CPU backend
        return False
    main = n - prefix_len
    # scripts/ab_nhd_step.py round-5, hard sync, one process: at the
    # SA-Open config (main=1024) NHD measured 33.06 vs 31.38 ms/step —
    # SLOWER than the transpose+BHND path (the 2.2 ms of head-split
    # transposes it removes are cheaper than the kernel's in-VMEM lane
    # splits at short N). At seq-6144 (SA-2.0) the round-4 trace has NHD
    # at ~78 TF/s ≈ the dh=64 ceiling and profitable — and the standard
    # prefix-split kernel DOES NOT COMPILE there (scoped VMEM 23.49M >
    # 16M, scaling ~linearly with N: it would graze the ceiling near
    # main ≈ 4100). Gate to the long-N regime with compile-safety margin;
    # the perf crossover lies in (1024, 6144).
    return 3584 <= main <= 16384


def _should_use_pallas(q, k, mask) -> bool:
    if os.environ.get("SAT_DISABLE_PALLAS_ATTN"):  # A/B escape hatch
        return False
    if mask is not None:
        return False
    if (jax.default_backend() != "tpu"
            and not os.environ.get("SAT_FORCE_PALLAS_ATTN")):
        return False
    # Flash pays off for long self-attention; small/cross attention is fine in XLA.
    return q.shape[-2] >= 512 and q.shape[-2] == k.shape[-2] and q.shape[-1] in (64, 128)


def init_kv_cache(batch: int, num_heads: int, max_len: int, dim_head: int,
                  dtype=jnp.float32):
    """Empty KV cache for incremental decoding."""
    return {
        "k": jnp.zeros((batch, num_heads, max_len, dim_head), dtype),
        "v": jnp.zeros((batch, num_heads, max_len, dim_head), dtype),
    }


def cached_decode_attention(q, k_step, v_step, cache, index):
    """One-token decode with a KV cache.

    q/k_step/v_step: [B, H, 1, D]; cache: {'k','v': [B, H, S, D]};
    index: scalar position. Returns (out [B, H, 1, D], new_cache).
    """
    k_cache = jax.lax.dynamic_update_slice(cache["k"], k_step.astype(cache["k"].dtype),
                                           (0, 0, index, 0))
    v_cache = jax.lax.dynamic_update_slice(cache["v"], v_step.astype(cache["v"].dtype),
                                           (0, 0, index, 0))
    S = k_cache.shape[2]
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache,
                        preferred_element_type=jnp.float32) * scale
    pos = jnp.arange(S)[None, None, None, :]
    logits = jnp.where(pos <= index, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v_cache)
    return out, {"k": k_cache, "v": v_cache}


class Attention(nn.Module):
    """Multi-head attention with GQA, qk-norm, rotary, differential attention."""

    dim: int
    dim_heads: int = 64
    dim_context: Optional[int] = None
    causal: bool = False
    zero_init_output: bool = True
    qk_norm: Literal["l2", "ln", "dyt", "none"] = "none"
    differential: bool = False
    feat_scale: bool = False
    # static count of prepended cond/memory tokens for self-attention
    # (module field, not a call arg: remat traces call args)
    prefix_len: int = 0

    def _apply_feat_scale(self, out):
        if not self.feat_scale:
            return out
        dim = self.dim
        lambda_dc = self.param("lambda_dc", nn.initializers.zeros, (dim,),
                               jnp.float32)
        lambda_hf = self.param("lambda_hf", nn.initializers.zeros, (dim,),
                               jnp.float32)
        out_dc = jnp.mean(out, axis=-2, keepdims=True)
        out_hf = out - out_dc
        return (out + lambda_dc.astype(out.dtype) * out_dc
                + lambda_hf.astype(out.dtype) * out_hf)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        rotary_pos_emb: Optional[jax.Array] = None,
        causal: Optional[bool] = None,
        sliding_window: Optional[Tuple[int, int]] = None,
        mask: Optional[jax.Array] = None,
        cache: Optional[dict] = None,
        cache_index: Optional[jax.Array] = None,
        kv_only: bool = False,
        precomputed_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    ):
        dim = self.dim
        dim_kv = self.dim_context if self.dim_context is not None else dim
        h = dim // self.dim_heads
        kv_h = dim_kv // self.dim_heads
        has_context = context is not None
        kv_input = context if has_context else x
        dense = lambda feats, name: QuantizableDense(
            feats, use_bias=False, name=name
        )

        n_q = 2 if self.differential else 1
        n_kv = 3 if self.differential else 2

        if kv_only:
            # Precompute split-head K/V from a constant context so AR decode
            # doesn't re-project the conditioning every step (the projection
            # dominates decode FLOPs for long contexts). qk-norm is applied
            # here so the main path can use the tensors verbatim.
            assert self.dim_context is not None and not self.differential
            k, v = InterleavedFusedProj(
                dim_kv * 2, 2, self.dim_heads, name="to_kv"
            )(kv_input)
            b, n, _ = k.shape
            k = k.reshape(b, n, kv_h, self.dim_heads).transpose(0, 2, 1, 3)
            v = v.reshape(b, n, kv_h, self.dim_heads).transpose(0, 2, 1, 3)
            if self.qk_norm == "l2":
                k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
            elif self.qk_norm == "ln":
                k_norm = nn.LayerNorm(epsilon=1e-6, name="k_norm", param_dtype=jnp.float32)
                k = k_norm(k.astype(jnp.float32)).astype(k.dtype)
            elif self.qk_norm == "dyt":
                k = DynamicTanh(self.dim_heads, name="k_norm")(k)
            return k, v

        if precomputed_kv is not None:
            assert self.dim_context is not None and not self.differential
            q_proj = dense(dim * n_q, "to_q")(x)
            q = q_proj
            q_diff = k_diff = None
            b, n, _ = q.shape
            q = q.reshape(b, n, h, self.dim_heads).transpose(0, 2, 1, 3)
            if self.qk_norm == "l2":
                q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
            elif self.qk_norm == "ln":
                q_norm = nn.LayerNorm(epsilon=1e-6, name="q_norm", param_dtype=jnp.float32)
                q = q_norm(q.astype(jnp.float32)).astype(q.dtype)
            elif self.qk_norm == "dyt":
                q = DynamicTanh(self.dim_heads, name="q_norm")(q)
            k, v = precomputed_kv
            if h != k.shape[1]:
                rep = h // k.shape[1]
                k = jnp.repeat(k, rep, axis=1)
                v = jnp.repeat(v, rep, axis=1)
            out = attention_core(q, k.astype(q.dtype), v.astype(q.dtype),
                                 causal=False, mask=mask)
            b, _, n, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b, n, dim)
            out = QuantizableDense(
                dim, use_bias=False, name="to_out",
                zero_init=self.zero_init_output,
            )(out)
            return self._apply_feat_scale(out)

        # Fused projections use a HEAD-MAJOR INTERLEAVED column layout
        # ([h][q|k|v][dh] for to_qkv, [h][k|v][dh] for to_kv, non-differential
        # paths): a tensor-parallel tiled sharding of the fused kernel then
        # lands every q/k/v boundary on a shard boundary for any shard count
        # dividing the head count — zero collectives where the torch-style
        # [q|k|v] concat layout forces GSPMD to reshard every layer. The
        # per-part matmuls run against strided PARAM slices (hoisted,
        # shard-local — see InterleavedFusedProj) so the activations stay
        # contiguous and the per-step program is shuffle-free. The torch
        # checkpoint importer (io/torch_mapping.py) permutes between the
        # layouts. Differential attention keeps the concat layout.
        if self.dim_context is not None:
            q_proj = dense(dim * n_q, "to_q")(x)
            if self.differential:
                kv_proj = dense(dim_kv * n_kv, "to_kv")(kv_input)
                q, q_diff = jnp.split(q_proj, n_q, axis=-1)
                k, k_diff, v = jnp.split(kv_proj, n_kv, axis=-1)
            else:
                q = q_proj
                k, v = InterleavedFusedProj(
                    dim_kv * 2, 2, self.dim_heads, name="to_kv"
                )(kv_input)
                q_diff = k_diff = None
        else:
            if self.differential:
                qkv = dense(dim * 5, "to_qkv")(x)
                q, k, v, q_diff, k_diff = jnp.split(qkv, 5, axis=-1)
            else:
                # cache path (AR decode): the decode runner pre-permutes
                # to_qkv to the concat layout outside the scan (see
                # models/lm.py::permute_fused_kernels_to_concat) so every
                # step is one contiguous weight read + contiguous splits
                q, k, v = InterleavedFusedProj(
                    dim * 3, 3, self.dim_heads, name="to_qkv"
                )(x, concat_kernel=cache is not None)
                q_diff = k_diff = None

        # Transpose-free dispatch: the head-pair NHD flash kernel reads
        # head pairs as 128-lane column tiles straight off the [B, N, H*dh]
        # projection output and writes the same layout into to_out — no
        # [B,N,H*dh]->[B,H,N,dh] HBM transposes in or out (2.2 ms/step at
        # SA-Open scale; see ops/kernels/flash_attention.py).
        is_causal = self.causal if causal is None else causal
        use_nhd = (not has_context and not self.differential and cache is None
                   and q.ndim == 3
                   and _should_use_nhd(q.shape[1], h, kv_h, self.dim_heads,
                                       is_causal, self.prefix_len, mask,
                                       sliding_window))
        nhd_wrap = None
        if use_nhd:
            from ..parallel.mesh import in_mesh_program

            if in_mesh_program():
                # TP mesh: shard_map heads onto 'model' (the fused projection
                # is already column=head sharded, so no resharding); the
                # head-PAIR kernel needs the LOCAL head count even
                nhd_wrap, local_h = _mesh_attn_shardmap(q.shape[0], h, "bnhd")
                if nhd_wrap is None or local_h % 2 != 0:
                    use_nhd = False
        if use_nhd:
            from .kernels.flash_attention import flash_attention_nhd

            b, n = q.shape[:2]
            qn = q.reshape(b, n, h, self.dim_heads)
            kn = k.reshape(b, n, kv_h, self.dim_heads)
            vn = v.reshape(b, n, kv_h, self.dim_heads)
            # qk-norm acts on the last (dh) axis: identical params and math
            # in either layout
            if self.qk_norm == "l2":
                qn = qn / (jnp.linalg.norm(qn, axis=-1, keepdims=True) + 1e-12)
                kn = kn / (jnp.linalg.norm(kn, axis=-1, keepdims=True) + 1e-12)
            elif self.qk_norm == "ln":
                q_norm = nn.LayerNorm(epsilon=1e-6, name="q_norm",
                                      param_dtype=jnp.float32)
                k_norm = nn.LayerNorm(epsilon=1e-6, name="k_norm",
                                      param_dtype=jnp.float32)
                qn = q_norm(qn.astype(jnp.float32)).astype(qn.dtype)
                kn = k_norm(kn.astype(jnp.float32)).astype(kn.dtype)
            elif self.qk_norm == "dyt":
                qn = DynamicTanh(self.dim_heads, name="q_norm")(qn)
                kn = DynamicTanh(self.dim_heads, name="k_norm")(kn)
            if rotary_pos_emb is not None:
                qn = apply_rotary_pos_emb_nhd(qn, rotary_pos_emb)
                kn = apply_rotary_pos_emb_nhd(kn, rotary_pos_emb)
            if kv_h != h:
                # GQA: repeat K/V to the query head count in the NHD layout
                # (axis 2 repeat ⇒ q head j reads kv head j//rep — same
                # grouping as the split-head path's axis-1 repeat)
                rep = h // kv_h
                kn = jnp.repeat(kn, rep, axis=2)
                vn = jnp.repeat(vn, rep, axis=2)
            pl = 0 if is_causal else self.prefix_len
            fn = lambda a, c, d: flash_attention_nhd(a, c, d, is_causal, pl)
            out = nhd_wrap(fn, qn, kn, vn) if nhd_wrap is not None \
                else fn(qn, kn, vn)
            out = out.reshape(b, n, dim)
            out = QuantizableDense(
                dim, use_bias=False, name="to_out",
                zero_init=self.zero_init_output,
            )(out)
            return self._apply_feat_scale(out)

        def split_heads(t, nh):
            if t.ndim == 4:  # already [B, H, N, dh] from the fused paths
                return t
            b, n = t.shape[:2]
            return t.reshape(b, n, nh, self.dim_heads).transpose(0, 2, 1, 3)

        q = split_heads(q, h)
        k = split_heads(k, kv_h)
        v = split_heads(v, kv_h)
        if self.differential:
            q_diff = split_heads(q_diff, h)
            k_diff = split_heads(k_diff, kv_h)

        if self.qk_norm == "l2":
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
            k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        elif self.qk_norm == "ln":
            q_norm = nn.LayerNorm(epsilon=1e-6, name="q_norm", param_dtype=jnp.float32)
            k_norm = nn.LayerNorm(epsilon=1e-6, name="k_norm", param_dtype=jnp.float32)
            q = q_norm(q.astype(jnp.float32)).astype(q.dtype)
            k = k_norm(k.astype(jnp.float32)).astype(k.dtype)
        elif self.qk_norm == "dyt":
            q = DynamicTanh(self.dim_heads, name="q_norm")(q)
            k = DynamicTanh(self.dim_heads, name="k_norm")(k)

        if cache is not None:
            # incremental decode: rotate q/k at the absolute cache position
            if rotary_pos_emb is not None:
                freqs_step = jax.lax.dynamic_slice_in_dim(
                    rotary_pos_emb, cache_index, 1, axis=0
                )
                q = apply_rotary_pos_emb(q, freqs_step)
                k = apply_rotary_pos_emb(k, freqs_step)
            if h != kv_h:
                rep = h // kv_h
                k = jnp.repeat(k, rep, axis=1)
                v = jnp.repeat(v, rep, axis=1)
            out, new_cache = cached_decode_attention(q, k, v, cache, cache_index)
            b, _, n, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b, n, dim)
            out = QuantizableDense(
                dim, use_bias=False, name="to_out",
                zero_init=self.zero_init_output,
            )(out)
            # feat_scale's DC/HF split is a FULL-SEQUENCE mean; on a single
            # decoded token it degenerates to (1+λ_dc)·out, silently
            # diverging from training semantics — refuse instead
            assert not self.feat_scale, (
                "feat_scale attention cannot use KV-cached decode (the DC/HF "
                "modulation needs the whole sequence); use the full forward")
            return out, new_cache

        if rotary_pos_emb is not None:
            # length-ratio frequency scaling for cross-attn (transformer.py:496-503)
            q_len, k_len = q.shape[-2], k.shape[-2]
            if q_len >= k_len:
                q_freqs, k_freqs = rotary_pos_emb, rotary_pos_emb * (q_len / k_len)
            else:
                q_freqs, k_freqs = rotary_pos_emb * (k_len / q_len), rotary_pos_emb
            q = apply_rotary_pos_emb(q, q_freqs)
            k = apply_rotary_pos_emb(k, k_freqs)
            if self.differential:
                q_diff = apply_rotary_pos_emb(q_diff, q_freqs)
                k_diff = apply_rotary_pos_emb(k_diff, k_freqs)

        if h != kv_h:
            rep = h // kv_h
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
            if self.differential:
                k_diff = jnp.repeat(k_diff, rep, axis=1)

        is_causal = self.causal if causal is None else causal
        if q.shape[-2] == 1:
            is_causal = False

        out = attention_core(
            q, k, v, causal=is_causal, window=sliding_window, mask=mask,
            prefix_len=0 if has_context else self.prefix_len,
        )
        if self.differential:
            out_diff = attention_core(
                q_diff, k_diff, v, causal=is_causal, window=sliding_window, mask=mask
            )
            out = out - out_diff

        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, dim)
        out_proj = QuantizableDense(
            dim, use_bias=False, name="to_out",
            zero_init=self.zero_init_output,
        )
        out = out_proj(out)
        return self._apply_feat_scale(out)
