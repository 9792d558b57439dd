"""Timestep and positional embeddings.

- FourierFeatures: reference models/blocks.py:85-94.
- RotaryEmbedding + apply_rotary_pos_emb: reference models/transformer.py:92-174.
  Partial rotary (GPT-J style two-half rotate), NTK base rescale, interpolation
  factor, fp32 rotary application. Rotation dim is typically dim_heads // 2.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn


class FourierFeatures(nn.Module):
    in_features: int
    out_features: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=self.std),
            (self.out_features // 2, self.in_features),
            jnp.float32,
        )
        f = 2 * math.pi * (x.astype(jnp.float32) @ weight.T)
        out = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)
        return out.astype(x.dtype)


def rotary_freqs(
    seq_len: int,
    rot_dim: int,
    base: float = 10000.0,
    base_rescale_factor: float = 1.0,
    interpolation_factor: float = 1.0,
) -> jax.Array:
    """[seq_len, rot_dim] rotary angle table (fp32).

    rot_dim is the number of rotated dimensions per head (freqs duplicated
    across the two halves, reference transformer.py:136-139).
    """
    base = base * base_rescale_factor ** (rot_dim / (rot_dim - 2))
    inv_freq = 1.0 / (base ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32) / interpolation_factor
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def _rotate_half(x: jax.Array) -> jax.Array:
    # reference transformer.py:149-152: split into two stacked halves (j=2)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(t: jax.Array, freqs: jax.Array, scale: float = 1.0) -> jax.Array:
    """Apply partial rotary embedding in fp32. t: [..., seq, dim_head]."""
    out_dtype = t.dtype
    rot_dim = freqs.shape[-1]
    seq_len = t.shape[-2]
    freqs = freqs[-seq_len:, :].astype(jnp.float32)
    tf = t.astype(jnp.float32)
    t_rot, t_pass = tf[..., :rot_dim], tf[..., rot_dim:]
    t_rot = t_rot * jnp.cos(freqs) * scale + _rotate_half(t_rot) * jnp.sin(freqs) * scale
    return jnp.concatenate([t_rot, t_pass], axis=-1).astype(out_dtype)


def apply_rotary_pos_emb_nhd(t: jax.Array, freqs: jax.Array,
                             scale: float = 1.0) -> jax.Array:
    """Rotary for the transpose-free [B, N, H, dh] activation layout
    (sequence on axis 1): same math as apply_rotary_pos_emb with the freqs
    broadcast over the head axis instead of the sequence axis."""
    out_dtype = t.dtype
    rot_dim = freqs.shape[-1]
    n = t.shape[1]
    freqs = freqs[-n:, :].astype(jnp.float32)[:, None, :]
    tf = t.astype(jnp.float32)
    t_rot, t_pass = tf[..., :rot_dim], tf[..., rot_dim:]
    t_rot = (t_rot * jnp.cos(freqs) * scale
             + _rotate_half(t_rot) * jnp.sin(freqs) * scale)
    return jnp.concatenate([t_rot, t_pass], axis=-1).astype(out_dtype)


class RotaryEmbedding(nn.Module):
    """Stateless rotary embedding table generator (no params)."""

    dim: int  # number of rotated dims (freqs table width)
    base: float = 10000.0
    base_rescale_factor: float = 1.0
    interpolation_factor: float = 1.0

    def __call__(self, seq_len: int) -> jax.Array:
        return rotary_freqs(
            seq_len,
            self.dim,
            base=self.base,
            base_rescale_factor=self.base_rescale_factor,
            interpolation_factor=self.interpolation_factor,
        )


class ScaledSinusoidalEmbedding(nn.Module):
    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [b, n, d] -> [n, dim] scaled sinusoidal positions."""
        scale = self.param(
            "scale", nn.initializers.constant(self.dim ** -0.5), (1,), jnp.float32
        )
        seq_len = x.shape[1]
        half_dim = self.dim // 2
        freq_seq = jnp.arange(half_dim, dtype=jnp.float32) / half_dim
        inv_freq = self.theta ** -freq_seq
        pos = jnp.arange(seq_len, dtype=jnp.float32)
        emb = jnp.einsum("i,j->ij", pos, inv_freq)
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        return (emb * scale).astype(x.dtype)


class AbsolutePositionalEmbedding(nn.Module):
    dim: int
    max_seq_len: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        emb = self.param(
            "emb", nn.initializers.normal(stddev=1.0), (self.max_seq_len, self.dim), jnp.float32
        )
        seq_len = x.shape[1]
        return (emb[:seq_len] * self.dim ** -0.5).astype(x.dtype)
