"""Causal LM backbones (reference stable_audio_tools/models/lm_backbone.py).

ContinuousTransformerAudioLMBackbone: causal in-repo transformer with
cross-attention and prepend conditioning (reference :102-158). The
x-transformers backbone maps to the same module here.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.transformer import ContinuousTransformer


class ContinuousTransformerAudioLMBackbone(nn.Module):
    embed_dim: int
    depth: int = 12
    num_heads: int = 8
    cross_attn_cond_dim: int = 0
    prepend_cond_dim: int = 0
    use_checkpointing: bool = True
    ff_mult: float = 4
    # "bfloat16" halves the param + KV-cache bandwidth of AR decode (the LM
    # decode step is HBM-bound at batch 1); params stay fp32.
    compute_dtype: tp.Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x,  # [B, S, embed_dim] (or [B, 1, embed_dim] for cached decode)
        cross_attn_cond=None,
        prepend_cond=None,
        prepend_cond_mask=None,
        mask=None,
        caches=None,
        cache_index=None,
        cross_kvs=None,
        compute_cross_kv=False,
    ):
        in_dtype = x.dtype
        if self.compute_dtype is not None:
            cdt = jnp.dtype(self.compute_dtype)
            x = x.astype(cdt)
            if cross_attn_cond is not None:
                cross_attn_cond = cross_attn_cond.astype(cdt)
            if prepend_cond is not None:
                prepend_cond = prepend_cond.astype(cdt)
        if caches is not None:
            assert prepend_cond is None, "prepend conditioning unsupported in cached decode"
        prepend_length = 0
        prepend_embeds = None
        if prepend_cond is not None:
            prepend_embeds = nn.Dense(
                self.embed_dim, name="to_prepend_embed", param_dtype=jnp.float32
            )(prepend_cond)
            prepend_length = prepend_embeds.shape[1]
        if cross_attn_cond is not None and self.cross_attn_cond_dim > 0:
            cross_attn_cond = nn.Dense(
                self.embed_dim, name="to_cross_attn_embed", param_dtype=jnp.float32
            )(cross_attn_cond)

        transformer = ContinuousTransformer(
            dim=self.embed_dim,
            depth=self.depth,
            dim_heads=self.embed_dim // self.num_heads,
            causal=True,
            cross_attend=cross_attn_cond is not None or self.cross_attn_cond_dim > 0,
            cond_token_dim=self.embed_dim if self.cross_attn_cond_dim > 0 else None,
            use_checkpointing=self.use_checkpointing,
            ff_mult=self.ff_mult,
            name="transformer",
        )
        if compute_cross_kv:
            # one-time per-layer K/V projection of the conditioning (the AR
            # decode scan reuses these every step instead of re-projecting)
            return transformer(x, context=cross_attn_cond, compute_cross_kv=True)
        if caches is not None:
            out, new_caches = transformer(
                x, context=cross_attn_cond, caches=caches, cache_index=cache_index,
                cross_kvs=cross_kvs,
            )
            return out.astype(in_dtype), new_caches
        out = transformer(
            x,
            prepend_embeds=prepend_embeds,
            prepend_mask=prepend_cond_mask.astype(bool)
            if prepend_cond_mask is not None else None,
            context=cross_attn_cond,
            mask=mask,
        )
        return out[:, prepend_length:, :].astype(in_dtype)
