"""Local-attention transformer encoder/decoder pyramids.

Capability parity with reference stable_audio_tools/models/local_attention.py:
ContinuousLocalTransformer (windowed attention + RoPE, AdaRMSNorm when
conditioned, :14-100), TransformerDownsampleBlock1D (trade seq-len for
channels, :102-143), TransformerUpsampleBlock1D (:145-183),
TransformerEncoder1D/Decoder1D (:189-277).

The NATTEN windowed-attention kernel maps to the same sliding-window mask the
Pallas flash kernel implements (window size w ≈ natten kernel w//2 each side).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import Attention
from ..ops.embeddings import RotaryEmbedding
from ..ops.norms import LayerNorm
from ..ops.transformer import FeedForward


class AdaRMSNorm(nn.Module):
    """RMS norm with conditioning-scaled gain (reference blocks.py:212-239)."""

    dim: int
    cond_dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, cond):
        scale = nn.Dense(self.dim, use_bias=False, name="to_scale",
                         kernel_init=nn.initializers.zeros,
                         param_dtype=jnp.float32)(cond)
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps
        )
        return (normed * (1 + scale[:, None, :])).astype(x.dtype)


class ContinuousLocalTransformer(nn.Module):
    dim: int
    depth: int
    dim_in: tp.Optional[int] = None
    dim_out: tp.Optional[int] = None
    causal: bool = False
    local_attn_window_size: int = 64
    heads: int = 8
    ff_mult: float = 2
    cond_dim: int = 0
    cross_attn_cond_dim: int = 0

    @nn.compact
    def __call__(self, x, mask=None, cond=None, cross_attn_cond=None,
                 cross_attn_cond_mask=None, prepend_cond=None):
        dim_head = self.dim // self.heads
        if self.dim_in is not None:
            x = nn.Dense(self.dim, name="project_in", param_dtype=jnp.float32)(x)
        if prepend_cond is not None:
            x = jnp.concatenate([prepend_cond, x], axis=1)
        pos_emb = RotaryEmbedding(
            dim=min(max(dim_head // 2, 32), dim_head)
        )(x.shape[1])
        w = self.local_attn_window_size
        window = (w // 2, w // 2)
        for i in range(self.depth):
            residual = x
            if self.cond_dim > 0 and cond is not None:
                h = AdaRMSNorm(self.dim, self.cond_dim, name=f"attn_norm_{i}")(x, cond)
            else:
                h = LayerNorm(self.dim, name=f"attn_norm_{i}")(x)
            h = Attention(
                dim=self.dim, dim_heads=dim_head, causal=self.causal,
                zero_init_output=True, name=f"attn_{i}",
            )(h, rotary_pos_emb=pos_emb, sliding_window=window, mask=mask)
            x = h + residual
            if self.cross_attn_cond_dim > 0 and cross_attn_cond is not None:
                x = Attention(
                    dim=self.dim, dim_heads=dim_head,
                    dim_context=self.cross_attn_cond_dim,
                    zero_init_output=True, name=f"xattn_{i}",
                )(x, context=cross_attn_cond, mask=cross_attn_cond_mask) + x
            residual = x
            if self.cond_dim > 0 and cond is not None:
                h = AdaRMSNorm(self.dim, self.cond_dim, name=f"ff_norm_{i}")(x, cond)
            else:
                h = LayerNorm(self.dim, name=f"ff_norm_{i}")(x)
            x = FeedForward(self.dim, mult=self.ff_mult, no_bias=True,
                            name=f"ff_{i}")(h) + residual
        if self.dim_out is not None:
            x = nn.Dense(self.dim_out, name="project_out", param_dtype=jnp.float32)(x)
        return x


class TransformerDownsampleBlock1D(nn.Module):
    in_channels: int
    embed_dim: int = 768
    depth: int = 3
    heads: int = 12
    downsample_ratio: int = 2
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        if self.in_channels != self.embed_dim:
            x = nn.Dense(self.embed_dim, use_bias=False, name="project_in",
                         param_dtype=jnp.float32)(x)
        x = ContinuousLocalTransformer(
            dim=self.embed_dim, depth=self.depth, heads=self.heads,
            local_attn_window_size=self.local_attn_window_size,
            name="transformer",
        )(x)
        B, N, C = x.shape
        r = self.downsample_ratio
        x = x.reshape(B, N // r, r * C)
        x = nn.Dense(self.embed_dim, use_bias=False, name="project_down",
                     param_dtype=jnp.float32)(x)
        return x


class TransformerUpsampleBlock1D(nn.Module):
    in_channels: int
    embed_dim: int = 768
    depth: int = 3
    heads: int = 12
    upsample_ratio: int = 2
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        if self.in_channels != self.embed_dim:
            x = nn.Dense(self.embed_dim, use_bias=False, name="project_in",
                         param_dtype=jnp.float32)(x)
        x = nn.Dense(self.embed_dim * self.upsample_ratio, use_bias=False,
                     name="project_up", param_dtype=jnp.float32)(x)
        B, N, CR = x.shape
        r = self.upsample_ratio
        x = x.reshape(B, N * r, CR // r)
        return ContinuousLocalTransformer(
            dim=self.embed_dim, depth=self.depth, heads=self.heads,
            local_attn_window_size=self.local_attn_window_size,
            name="transformer",
        )(x)


class TransformerEncoder1D(nn.Module):
    in_channels: int
    out_channels: int
    embed_dims: tp.Tuple[int, ...] = (96, 192, 384, 768)
    heads: tp.Tuple[int, ...] = (12, 12, 12, 12)
    depths: tp.Tuple[int, ...] = (3, 3, 3, 3)
    ratios: tp.Tuple[int, ...] = (2, 2, 2, 2)
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        """x NLC (factory-standard encoder interface)."""
        x = nn.Dense(self.embed_dims[0], use_bias=False, name="project_in",
                     param_dtype=jnp.float32)(x)
        for i in range(len(self.depths)):
            prev = self.embed_dims[i - 1] if i > 0 else self.embed_dims[0]
            x = TransformerDownsampleBlock1D(
                in_channels=prev, embed_dim=self.embed_dims[i],
                heads=self.heads[i], depth=self.depths[i],
                downsample_ratio=self.ratios[i],
                local_attn_window_size=self.local_attn_window_size,
                name=f"layer_{i}",
            )(x)
        x = nn.Dense(self.out_channels, use_bias=False, name="project_out",
                     param_dtype=jnp.float32)(x)
        return x


class TransformerDecoder1D(nn.Module):
    in_channels: int
    out_channels: int
    embed_dims: tp.Tuple[int, ...] = (768, 384, 192, 96)
    heads: tp.Tuple[int, ...] = (12, 12, 12, 12)
    depths: tp.Tuple[int, ...] = (3, 3, 3, 3)
    ratios: tp.Tuple[int, ...] = (2, 2, 2, 2)
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dims[0], use_bias=False, name="project_in",
                     param_dtype=jnp.float32)(x)
        for i in range(len(self.depths)):
            prev = self.embed_dims[i - 1] if i > 0 else self.embed_dims[0]
            x = TransformerUpsampleBlock1D(
                in_channels=prev, embed_dim=self.embed_dims[i],
                heads=self.heads[i], depth=self.depths[i],
                upsample_ratio=self.ratios[i],
                local_attn_window_size=self.local_attn_window_size,
                name=f"layer_{i}",
            )(x)
        x = nn.Dense(self.out_channels, use_bias=False, name="project_out",
                     param_dtype=jnp.float32)(x)
        return x
