"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.ops.attention import dot_product_attention
from stable_audio_tools_tpu.ops.kernels.flash_attention import flash_attention


@pytest.mark.parametrize("causal,window", [
    (False, None),
    (True, None),
    (False, (63, 64)),
    (False, (31, 32)),
    (True, (31, -1)),
])
def test_flash_attention_matches_xla(causal, window):
    rng = np.random.RandomState(0)
    B, H, N, D = 1, 2, 512, 64
    q, k, v = (jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
               for _ in range(3))
    out_p = flash_attention(q, k, v, causal, window)
    out_x = dot_product_attention(q, k, v, causal=causal, window=window)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-3, atol=1e-4)


def test_flash_attention_unpadded_length():
    rng = np.random.RandomState(1)
    B, H, N, D = 1, 2, 300, 64  # not a multiple of block size
    q, k, v = (jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
               for _ in range(3))
    out_p = flash_attention(q, k, v, False, None)
    out_x = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("causal,window,N", [
    (False, (31, 32), 256),
    (True, None, 256),
    (False, None, 300),      # unpadded length exercises masked k + zero-dO rows
    (True, (31, -1), 512),   # causal banded (static trip count path)
])
def test_flash_attention_grads(causal, window, N):
    rng = np.random.RandomState(2)
    B, H, D = 1, 2, 64
    q, k, v = (jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
               for _ in range(3))
    # non-uniform cotangent so dO varies per row
    w = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))

    def loss_p(q, k, v):
        return jnp.sum(w * flash_attention(q, k, v, causal, window) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(
            w * dot_product_attention(q, k, v, causal=causal, window=window) ** 2
        )

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
