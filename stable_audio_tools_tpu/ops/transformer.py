"""The shared transformer stack (DiT / TAAE / LM backbone).

Capability parity with reference models/transformer.py:582-865:
TransformerBlock with optional adaLN scale/shift/gate from a global cond
vector, LayerScale, Conformer module, per-block RoPE; ContinuousTransformer
with project_in/out, prepend embeds, memory tokens, sinusoidal/absolute
positional embeddings, per-layer remat, and early exit.

TPU-first details: blocks run under `nn.remat` (jax.checkpoint) when
requested, the layer stack unrolls at trace time (static depth), and all
norms/softmax are fp32 inside bf16 compute.
"""

from __future__ import annotations

from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import Attention, QuantizableDense
from .embeddings import (
    AbsolutePositionalEmbedding,
    RotaryEmbedding,
    ScaledSinusoidalEmbedding,
)
from .norms import DynamicTanh, LayerNorm, LayerScale


class GLU(nn.Module):
    """Gated linear unit with a PAIRWISE-INTERLEAVED fused projection.

    Column layout of `proj` is (x_0, gate_0, x_1, gate_1, ...) rather than the
    torch-style [x | gate] concat: a tensor-parallel tiled sharding of the
    kernel then keeps every (x_j, gate_j) pair on one shard for any shard
    count dividing dim_out (the concat layout pairs elements across shards
    and forces GSPMD to reshard). io/torch_mapping.py permutes on import.
    """

    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array, concat_kernel: bool = False) -> jax.Array:
        xx, gate = _PairedProj(self.dim_out, name="proj")(x, concat_kernel)
        return xx * jax.nn.silu(gate)


class _PairedProj(nn.Module):
    """Pairwise-interleaved fused projection applied as two matmuls against
    strided PARAM slices: the slices are loop-invariant (hoisted out of
    sampler scans) and shard-local under TP, so activations stay contiguous
    with zero per-step shuffles. Param layout (x_0, g_0, x_1, g_1, ...) —
    same path names as the nn.Dense it replaces (kernel/bias)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array, concat_kernel: bool = False):
        din = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (din, self.dim_out * 2), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.dim_out * 2,), jnp.float32)
        # honor the concat layout only when the variables were actually
        # permuted (layout marker from permute_fused_kernels_to_concat) —
        # see InterleavedFusedProj
        if concat_kernel and not self.has_variable("layout", "concat"):
            concat_kernel = False
        assert concat_kernel or not self.has_variable("params", "kernel_scale"), (
            "int8-quantized kernel reached the paired path — apply "
            "permute_fused_kernels_to_concat before quantize_decode_kernels_int8")
        if concat_kernel:
            # KV-cached decode: kernel pre-permuted to [x | gate] concat
            # layout outside the scan (models/lm.py) — one contiguous weight
            # read + contiguous split; strided ops inside the sequential
            # decode scan measured ~1.5x slower end-to-end. Optional int8
            # weight-only dequant scale (models/lm.py).
            proj = x @ kernel.astype(x.dtype)
            if self.has_variable("params", "kernel_scale"):
                scale = self.get_variable("params", "kernel_scale")
                proj = proj * scale.astype(x.dtype)
            proj = proj + bias.astype(x.dtype)
            return tuple(jnp.split(proj, 2, axis=-1))
        k3 = kernel.reshape(din, self.dim_out, 2)
        b2 = bias.reshape(self.dim_out, 2)
        xx = x @ k3[..., 0].astype(x.dtype) + b2[:, 0].astype(x.dtype)
        gate = x @ k3[..., 1].astype(x.dtype) + b2[:, 1].astype(x.dtype)
        return xx, gate


class FeedForward(nn.Module):
    dim: int
    dim_out: Optional[int] = None
    mult: float = 4
    no_bias: bool = False
    glu: bool = True
    zero_init_output: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, concat_kernel: bool = False) -> jax.Array:
        inner_dim = int(self.dim * self.mult)
        dim_out = self.dim_out if self.dim_out is not None else self.dim
        if self.glu:
            x = GLU(inner_dim, name="linear_in")(x, concat_kernel)
        else:
            x = QuantizableDense(
                inner_dim, use_bias=not self.no_bias, name="linear_in",
            )(x)
            x = jax.nn.silu(x)
        out = QuantizableDense(
            dim_out,
            use_bias=not self.no_bias,
            name="linear_out",
            zero_init=self.zero_init_output,
        )(x)
        return out


class ConformerModule(nn.Module):
    dim: int
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = LayerNorm(self.dim, eps=self.norm_eps, name="in_norm")(x)
        x = nn.Dense(self.dim, use_bias=False, name="pointwise_conv", dtype=x.dtype,
                     param_dtype=jnp.float32)(x)
        x = GLU(self.dim, name="glu")(x)
        # depthwise conv over time, kernel 17
        C = self.dim
        kernel = self.param(
            "depthwise_kernel", nn.initializers.lecun_normal(), (17, 1, C), jnp.float32
        )
        x = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1,),
            padding=[(8, 8)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C,
        )
        x = LayerNorm(self.dim, eps=self.norm_eps, name="mid_norm")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.dim, use_bias=False, name="pointwise_conv_2", dtype=x.dtype,
                     param_dtype=jnp.float32)(x)
        return x


class TransformerBlock(nn.Module):
    dim: int
    dim_heads: int = 64
    cross_attend: bool = False
    dim_context: Optional[int] = None
    global_cond_dim: Optional[int] = None
    causal: bool = False
    zero_init_branch_outputs: bool = True
    conformer: bool = False
    layer_ix: int = -1
    remove_norms: bool = False
    add_rope: bool = False
    layer_scale: bool = False
    qk_norm: Literal["l2", "ln", "dyt", "none"] = "none"
    differential: bool = False
    feat_scale: bool = False
    ff_mult: float = 4
    ff_no_bias: bool = True
    norm_eps: float = 1e-5
    # static config (not a call arg: remat would trace the ints)
    sliding_window: Optional[Tuple[int, int]] = None
    # count of prepended cond/memory tokens (enables the prefix-split flash
    # dispatch when the main sequence is block-aligned; see ops/attention.py)
    prefix_len: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        global_cond: Optional[jax.Array] = None,
        rotary_pos_emb: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        context_mask: Optional[jax.Array] = None,
        cache: Optional[dict] = None,
        cache_index: Optional[jax.Array] = None,
        cross_kv: Optional[tuple] = None,
        cross_kv_only: bool = False,
    ):
        sliding_window = self.sliding_window
        dim_heads = min(self.dim_heads, self.dim)
        zero_init = self.zero_init_branch_outputs and not self.layer_scale

        if cross_kv_only:
            # project the (constant) cross-attention context to split-head K/V
            # once, for reuse across every AR decode step
            if not self.cross_attend:
                return None
            cross_attn = Attention(
                dim=self.dim, dim_heads=dim_heads, dim_context=self.dim_context,
                causal=self.causal, zero_init_output=zero_init,
                qk_norm=self.qk_norm, name="cross_attn",
            )
            return cross_attn(x, context=context, kv_only=True)

        def make_norm(name):
            if self.remove_norms:
                return DynamicTanh(self.dim, name=name)
            return LayerNorm(self.dim, eps=self.norm_eps, name=name)

        def make_scale(name):
            if self.layer_scale:
                return LayerScale(self.dim, name=name)
            return lambda t: t

        if self.add_rope and rotary_pos_emb is None:
            rotary_pos_emb = RotaryEmbedding(dim=dim_heads // 2)(x.shape[-2])

        self_attn = Attention(
            dim=self.dim,
            dim_heads=dim_heads,
            causal=self.causal,
            zero_init_output=zero_init,
            qk_norm=self.qk_norm,
            differential=self.differential,
            feat_scale=self.feat_scale,
            prefix_len=self.prefix_len,
            name="self_attn",
        )
        self_attn_scale = make_scale("self_attn_scale")
        pre_norm = make_norm("pre_norm")
        ff_norm = make_norm("ff_norm")
        ff = FeedForward(
            self.dim, mult=self.ff_mult, no_bias=self.ff_no_bias,
            zero_init_output=zero_init, name="ff",
        )
        ff_scale = make_scale("ff_scale")

        if cache is not None:
            # incremental decode step: x is [B, 1, dim]
            attn_out, new_cache = self_attn(
                pre_norm(x), rotary_pos_emb=rotary_pos_emb,
                cache=cache, cache_index=cache_index,
            )
            x = x + self_attn_scale(attn_out)
            if (context is not None or cross_kv is not None) and self.cross_attend:
                cross_norm = make_norm("cross_attend_norm")
                cross_attn = Attention(
                    dim=self.dim, dim_heads=dim_heads, dim_context=self.dim_context,
                    causal=self.causal, zero_init_output=zero_init,
                    qk_norm=self.qk_norm, name="cross_attn",
                )
                cross_scale = make_scale("cross_attn_scale")
                x = x + cross_scale(
                    cross_attn(cross_norm(x), context=context, mask=context_mask,
                               precomputed_kv=cross_kv)
                )
            x = x + ff_scale(ff(ff_norm(x), concat_kernel=True))
            return x, new_cache

        # Sequence parallelism under TP mesh programs: constrain the residual
        # stream's seq axis onto the 'model' axis at block entry. GSPMD then
        # runs the norms/adds 1/tp-sharded and lowers the out-projection
        # all-reduce as reduce-scatter + all-gather (parallel/mesh.py).
        # No-op on single-chip traces.
        from ..parallel.mesh import seq_shard_constraint

        x = seq_shard_constraint(x)

        use_adaln = (
            self.global_cond_dim is not None
            and self.global_cond_dim > 0
            and global_cond is not None
        )
        if use_adaln:
            ssg_param = self.param(
                "to_scale_shift_gate",
                nn.initializers.normal(stddev=self.dim ** -0.5),
                (6 * self.dim,),
                jnp.float32,
            )
            ssg = (ssg_param.astype(x.dtype) + global_cond)[:, None, :]
            scale_self, shift_self, gate_self, scale_ff, shift_ff, gate_ff = jnp.split(
                ssg, 6, axis=-1
            )
            residual = x
            h = pre_norm(x)
            h = h * (1 + scale_self) + shift_self
            h = self_attn(h, rotary_pos_emb=rotary_pos_emb, sliding_window=sliding_window,
                          mask=mask)
            h = h * jax.nn.sigmoid(1 - gate_self)
            x = residual + self_attn_scale(h)
        else:
            x = x + self_attn_scale(
                self_attn(pre_norm(x), rotary_pos_emb=rotary_pos_emb,
                          sliding_window=sliding_window, mask=mask)
            )

        if context is not None and self.cross_attend:
            cross_norm = make_norm("cross_attend_norm")
            cross_attn = Attention(
                dim=self.dim,
                dim_heads=dim_heads,
                dim_context=self.dim_context,
                causal=self.causal,
                zero_init_output=zero_init,
                qk_norm=self.qk_norm,
                name="cross_attn",
            )
            cross_scale = make_scale("cross_attn_scale")
            x = x + cross_scale(cross_attn(cross_norm(x), context=context, mask=context_mask))

        if self.conformer:
            conf = ConformerModule(self.dim, norm_eps=self.norm_eps, name="conformer")
            conf_scale = make_scale("conformer_scale")
            x = x + conf_scale(conf(x))

        if use_adaln:
            residual = x
            h = ff_norm(x)
            h = h * (1 + scale_ff) + shift_ff
            h = ff(h)
            h = h * jax.nn.sigmoid(1 - gate_ff)
            x = residual + ff_scale(h)
        else:
            x = x + ff_scale(ff(ff_norm(x)))
        return x


class ContinuousTransformer(nn.Module):
    dim: int
    depth: int
    dim_in: Optional[int] = None
    dim_out: Optional[int] = None
    dim_heads: int = 64
    cross_attend: bool = False
    cond_token_dim: Optional[int] = None
    final_cross_attn_ix: int = -1
    global_cond_dim: Optional[int] = None
    causal: bool = False
    rotary_pos_emb: bool = True
    zero_init_branch_outputs: bool = True
    conformer: bool = False
    use_sinusoidal_emb: bool = False
    use_abs_pos_emb: bool = False
    abs_pos_emb_max_length: int = 10000
    num_memory_tokens: int = 0
    sliding_window: Optional[Tuple[int, int]] = None
    layer_scale: bool = False
    remove_norms: bool = False
    add_rope: bool = False
    qk_norm: Literal["l2", "ln", "dyt", "none"] = "none"
    ff_mult: float = 4
    use_checkpointing: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        prepend_embeds: Optional[jax.Array] = None,
        prepend_mask: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        context_mask: Optional[jax.Array] = None,
        global_cond: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        return_info: bool = False,
        exit_layer_ix: Optional[int] = None,
        caches: Optional[list] = None,
        cache_index: Optional[jax.Array] = None,
        cross_kvs: Optional[list] = None,
        compute_cross_kv: bool = False,
    ):
        if compute_cross_kv:
            # one-time projection of the conditioning context into per-layer
            # split-head K/V for the cached AR decode path
            kvs = []
            for i in range(self.depth):
                should = self.cross_attend and (
                    self.final_cross_attn_ix == -1 or i <= self.final_cross_attn_ix
                )
                block = TransformerBlock(
                    dim=self.dim, dim_heads=self.dim_heads, cross_attend=should,
                    dim_context=self.cond_token_dim, causal=self.causal,
                    zero_init_branch_outputs=self.zero_init_branch_outputs,
                    layer_ix=i, layer_scale=self.layer_scale,
                    remove_norms=self.remove_norms, qk_norm=self.qk_norm,
                    ff_mult=self.ff_mult, name=f"layers_{i}",
                )
                kvs.append(block(x, context=context, cross_kv_only=True))
            return kvs

        batch = x.shape[0]
        info = {"hidden_states": []}

        if self.dim_in is not None:
            x = nn.Dense(self.dim, use_bias=False, name="project_in", dtype=x.dtype,
                         param_dtype=jnp.float32)(x)

        if prepend_embeds is not None:
            assert prepend_embeds.shape[-1] == x.shape[-1], (
                "prepend dimension must match sequence dimension"
            )
            x = jnp.concatenate([prepend_embeds.astype(x.dtype), x], axis=-2)
            if mask is not None:
                if prepend_mask is None:
                    prepend_mask = jnp.ones((batch, prepend_embeds.shape[1]), dtype=bool)
                mask = jnp.concatenate([prepend_mask, mask], axis=-1)

        if self.num_memory_tokens > 0:
            memory_tokens = self.param(
                "memory_tokens",
                nn.initializers.normal(stddev=1.0),
                (self.num_memory_tokens, self.dim),
                jnp.float32,
            )
            mem = jnp.broadcast_to(
                memory_tokens.astype(x.dtype)[None],
                (batch, self.num_memory_tokens, self.dim),
            )
            x = jnp.concatenate([mem, x], axis=1)
            if mask is not None:
                mask = jnp.concatenate(
                    [jnp.ones((batch, self.num_memory_tokens), dtype=bool), mask], axis=-1
                )

        rope = None
        if self.rotary_pos_emb:
            rope_len = caches[0]["k"].shape[2] if caches is not None else x.shape[1]
            rope = RotaryEmbedding(
                dim=min(max(self.dim_heads // 2, 32), self.dim_heads)
            )(rope_len)

        if self.use_sinusoidal_emb:
            x = x + ScaledSinusoidalEmbedding(self.dim, name="pos_emb")(x)
        elif self.use_abs_pos_emb:
            x = x + AbsolutePositionalEmbedding(
                self.dim,
                self.abs_pos_emb_max_length + self.num_memory_tokens,
                name="pos_emb",
            )(x)

        if global_cond is not None and self.global_cond_dim is not None:
            h = nn.Dense(self.dim, name="global_embed_0", dtype=x.dtype,
                         param_dtype=jnp.float32)(global_cond)
            h = jax.nn.silu(h)
            global_cond = nn.Dense(self.dim * 6, name="global_embed_1", dtype=x.dtype,
                                   param_dtype=jnp.float32)(h)

        block_cls = TransformerBlock
        if self.use_checkpointing and caches is None:
            block_cls = nn.remat(
                TransformerBlock,
                static_argnums=(),
                prevent_cse=False,
            )

        # prepended cond/memory tokens ahead of the main sequence: lets the
        # flash kernel run on the block-aligned main length (e.g. 1 + 1024)
        n_prefix = self.num_memory_tokens + (
            prepend_embeds.shape[1] if prepend_embeds is not None else 0
        )

        out_x = None
        for i in range(self.depth):
            should_cross_attend = self.cross_attend and (
                self.final_cross_attn_ix == -1 or i <= self.final_cross_attn_ix
            )
            layer = block_cls(
                dim=self.dim,
                dim_heads=self.dim_heads,
                cross_attend=should_cross_attend,
                dim_context=self.cond_token_dim,
                global_cond_dim=self.dim * 6 if self.global_cond_dim is not None else None,
                causal=self.causal,
                zero_init_branch_outputs=self.zero_init_branch_outputs,
                conformer=self.conformer,
                layer_ix=i,
                layer_scale=self.layer_scale,
                remove_norms=self.remove_norms,
                add_rope=self.add_rope,
                qk_norm=self.qk_norm,
                ff_mult=self.ff_mult,
                sliding_window=self.sliding_window,
                prefix_len=n_prefix,
                name=f"layers_{i}",
            )
            if caches is not None:
                x, caches[i] = layer(
                    x,
                    context=context if should_cross_attend else None,
                    rotary_pos_emb=rope,
                    cache=caches[i],
                    cache_index=cache_index,
                    cross_kv=cross_kvs[i]
                    if (cross_kvs is not None and should_cross_attend) else None,
                )
                continue
            x = layer(
                x,
                context=context if should_cross_attend else None,
                global_cond=global_cond,
                rotary_pos_emb=rope,
                mask=mask,
                context_mask=context_mask,
            )
            if return_info:
                info["hidden_states"].append(x)
            if exit_layer_ix is not None and i == exit_layer_ix:
                out_x = x[:, self.num_memory_tokens :, :]
                if return_info:
                    return out_x, info
                return out_x

        x = x[:, self.num_memory_tokens :, :]
        if self.dim_out is not None:
            x = nn.Dense(self.dim_out, use_bias=False, name="project_out", dtype=x.dtype,
                         param_dtype=jnp.float32)(x)
        if caches is not None:
            return x, caches
        if return_info:
            return x, info
        return x
