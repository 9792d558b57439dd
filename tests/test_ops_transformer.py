"""Tests for activations, norms, embeddings, attention, transformer blocks."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from stable_audio_tools_tpu.ops.activations import snake_beta, SnakeBeta
from stable_audio_tools_tpu.ops.attention import Attention, dot_product_attention
from stable_audio_tools_tpu.ops.embeddings import (
    FourierFeatures,
    apply_rotary_pos_emb,
    rotary_freqs,
)
from stable_audio_tools_tpu.ops.norms import LayerNorm, RMSNorm
from stable_audio_tools_tpu.ops.transformer import (
    ContinuousTransformer,
    FeedForward,
    TransformerBlock,
)


def test_snake_beta_matches_reference_formula():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 4).astype(np.float32)
    alpha = np.exp(rng.randn(4).astype(np.float32) * 0.1)
    beta = np.exp(rng.randn(4).astype(np.float32) * 0.1)
    out = snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta))
    ref = x + (1.0 / (beta + 1e-9)) * np.sin(x * alpha) ** 2
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_snake_beta_module_identity_at_init():
    """logscale init: alpha=beta=1 → x + sin(x)^2."""
    m = SnakeBeta(features=3)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    ref = np.asarray(x) + np.sin(np.asarray(x)) ** 2 / (1 + 1e-9)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_layernorm_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 10, 8).astype(np.float32)
    m = LayerNorm(8)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))
    ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (8,)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_attention_matches_torch_sdpa():
    rng = np.random.RandomState(3)
    B, H, N, D = 2, 4, 32, 16
    q = rng.randn(B, H, N, D).astype(np.float32)
    k = rng.randn(B, H, N, D).astype(np.float32)
    v = rng.randn(B, H, N, D).astype(np.float32)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_attention_causal_matches_torch():
    rng = np.random.RandomState(4)
    B, H, N, D = 1, 2, 16, 8
    q, k, v = (rng.randn(B, H, N, D).astype(np.float32) for _ in range(3))
    out = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True
    )
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), is_causal=True
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_sliding_window_restricts_attention():
    """With window (w, w) each query only sees keys within the window."""
    B, H, N, D = 1, 1, 12, 4
    rng = np.random.RandomState(5)
    q, k = (rng.randn(B, H, N, D).astype(np.float32) for _ in range(2))
    # one-hot values so output reveals which keys were attended
    v = np.eye(N, dtype=np.float32)[None, None]
    out = np.asarray(
        dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v[:, :, :, :]), window=(2, 2)
        )
    )
    for i in range(N):
        weights = out[0, 0, i]
        visible = np.zeros(N, bool)
        visible[max(0, i - 2): i + 3] = True
        assert np.all(weights[~visible] < 1e-6), f"row {i} leaked outside window"


def test_rotary_matches_reference_rotate_half():
    """Check fp32 partial-rotary math against a numpy re-derivation."""
    N, D = 8, 16
    rot_dim = 8
    freqs = np.asarray(rotary_freqs(N, rot_dim))
    rng = np.random.RandomState(6)
    t = rng.randn(1, 2, N, D).astype(np.float32)
    out = np.asarray(apply_rotary_pos_emb(jnp.asarray(t), jnp.asarray(freqs)))
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    x1, x2 = t_rot[..., : rot_dim // 2], t_rot[..., rot_dim // 2:]
    rotated = np.concatenate([-x2, x1], axis=-1)
    ref_rot = t_rot * np.cos(freqs) + rotated * np.sin(freqs)
    ref = np.concatenate([ref_rot, t_pass], axis=-1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_fourier_features_shape_and_form():
    m = FourierFeatures(in_features=1, out_features=256)
    x = jnp.asarray([[0.5], [0.1]])
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 256)
    w = np.asarray(params["params"]["weight"])
    f = 2 * math.pi * np.asarray(x) @ w.T
    ref = np.concatenate([np.cos(f), np.sin(f)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_transformer_block_runs_and_zero_init_is_identity():
    m = TransformerBlock(dim=32, dim_heads=8)
    x = jnp.asarray(np.random.RandomState(7).randn(2, 10, 32).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # zero-init branch outputs → block is the identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_transformer_block_adaln():
    m = TransformerBlock(dim=32, dim_heads=8, global_cond_dim=32 * 6)
    x = jnp.asarray(np.random.RandomState(8).randn(2, 10, 32).astype(np.float32))
    g = jnp.asarray(np.random.RandomState(9).randn(2, 32 * 6).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x, global_cond=g)
    out = m.apply(params, x, global_cond=g)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_continuous_transformer_full_surface():
    m = ContinuousTransformer(
        dim=32,
        depth=2,
        dim_in=16,
        dim_out=8,
        dim_heads=8,
        cross_attend=True,
        cond_token_dim=16,
        num_memory_tokens=2,
        use_checkpointing=False,
    )
    x = jnp.zeros((2, 12, 16))
    ctx = jnp.zeros((2, 5, 16))
    prep = jnp.zeros((2, 3, 32))
    params = m.init(jax.random.PRNGKey(0), x, context=ctx, prepend_embeds=prep)
    out = m.apply(params, x, context=ctx, prepend_embeds=prep)
    # output keeps prepend but strips memory tokens
    assert out.shape == (2, 15, 8)

    out2, info = m.apply(
        params, x, context=ctx, prepend_embeds=prep, return_info=True
    )
    assert len(info["hidden_states"]) == 2

    out3 = m.apply(params, x, context=ctx, prepend_embeds=prep, exit_layer_ix=0)
    assert out3.shape == (2, 15, 32)


def test_continuous_transformer_global_cond_adaln():
    m = ContinuousTransformer(
        dim=32, depth=2, dim_heads=8, global_cond_dim=32, use_checkpointing=False
    )
    x = jnp.zeros((2, 12, 32))
    g = jnp.zeros((2, 32))
    params = m.init(jax.random.PRNGKey(0), x, global_cond=g)
    out = m.apply(params, x, global_cond=g)
    assert out.shape == (2, 12, 32)


def test_gqa_attention():
    m = Attention(dim=32, dim_heads=8, dim_context=16)  # 4 q heads, 2 kv heads
    x = jnp.zeros((2, 10, 32))
    ctx = jnp.asarray(np.random.RandomState(10).randn(2, 6, 16).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x, context=ctx)
    out = m.apply(params, x, context=ctx)
    assert out.shape == (2, 10, 32)


def test_differential_attention_runs_and_reduces_to_difference():
    """Differential attention (reference transformer.py:344,516-521): two
    attention maps subtracted. With the diff branch's value output at zero
    contribution the module must still produce finite output and differ from
    standard attention with the same q/k/v weights."""
    from stable_audio_tools_tpu.ops.attention import Attention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
    attn = Attention(dim=64, dim_heads=32, differential=True,
                     zero_init_output=False)
    v = attn.init(jax.random.PRNGKey(1), x)
    out = attn.apply(v, x)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))

    std = Attention(dim=64, dim_heads=32, differential=False,
                    zero_init_output=False)
    vs = std.init(jax.random.PRNGKey(1), x)
    out_std = std.apply(vs, x)
    assert not np.allclose(np.asarray(out), np.asarray(out_std))


def test_quantizable_dense_matches_nn_dense_and_consumes_scale():
    """QuantizableDense == nn.Dense numerically; with an int8 kernel +
    kernel_scale sibling it dequantizes to ~1e-2 relative error."""
    from flax import linen as nn

    from stable_audio_tools_tpu.ops.attention import (
        QuantizableDense, quantize_kernel_int8,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 32))
    qd = QuantizableDense(48)
    v = qd.init(jax.random.PRNGKey(1), x)
    ref = nn.Dense(48).apply(
        {"params": {"kernel": v["params"]["kernel"],
                    "bias": v["params"]["bias"]}}, x)
    np.testing.assert_allclose(np.asarray(qd.apply(v, x)), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    w8, scale = quantize_kernel_int8(v["params"]["kernel"])
    vq = {"params": {"kernel": w8, "kernel_scale": scale,
                     "bias": v["params"]["bias"]}}
    out_q = qd.apply(vq, x)
    err = np.max(np.abs(np.asarray(out_q) - np.asarray(ref)))
    assert err < 0.05 * float(np.max(np.abs(np.asarray(ref)))) + 0.05, err
