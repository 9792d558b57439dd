"""Pallas fused LayerNorm: forward parity + analytic backward dtypes.

The public fused_layer_norm falls back to XLA off-TPU, so these tests hit
the custom_vjp wrappers directly (the pallas_call runs interpreted on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.ops.kernels.layer_norm import (
    _fused_ln_beta,
    _fused_ln_nobeta,
    _ln_forward,
    _xla_layer_norm,
)


def _data(dtype=jnp.float32, B=2, N=300, C=256):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(dtype)
    gamma = jnp.asarray(rng.randn(C).astype(np.float32))
    beta = jnp.asarray(rng.randn(C).astype(np.float32))
    return x, gamma, beta


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("N", [300, 256])  # ragged (600-row) and exact grids
def test_ln_forward_matches_xla(dtype, N):
    # N=300 → 600 rows = 2×256 + 88-row tail: covers the maskless ragged
    # tail block (no explicit pad; OOB stores dropped by pallas)
    x, gamma, beta = _data(dtype, N=N)
    got = _ln_forward(x, gamma, beta, 1e-5)
    want = _xla_layer_norm(x, gamma, beta, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5, atol=1e-2)


def test_ln_grads_match_xla():
    x, gamma, beta = _data()

    def loss_f(f):
        return lambda x, g, b: jnp.sum(jnp.sin(f(x, g, b)))

    g_fused = jax.grad(loss_f(lambda x, g, b: _fused_ln_beta(x, g, b, 1e-5)),
                       argnums=(0, 1, 2))(x, gamma, beta)
    g_xla = jax.grad(loss_f(lambda x, g, b: _xla_layer_norm(x, g, b, 1e-5)),
                     argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    g_nb = jax.grad(loss_f(lambda x, g, b: _fused_ln_nobeta(x, g, 1e-5)),
                    argnums=(0, 1))(x, gamma, beta)
    g_nb_ref = jax.grad(loss_f(lambda x, g, b: _xla_layer_norm(x, g, None, 1e-5)),
                        argnums=(0, 1))(x, gamma, beta)
    for a, b in zip(g_nb, g_nb_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_ln_grad_dtypes_match_primals():
    """Cotangents must carry the primal dtypes (bf16 beta/gamma regression)."""
    x, gamma, beta = _data(jnp.bfloat16)
    gamma = gamma.astype(jnp.bfloat16)
    beta = beta.astype(jnp.bfloat16)
    g = jax.grad(
        lambda x, g, b: jnp.sum(_fused_ln_beta(x, g, b, 1e-5).astype(jnp.float32)),
        argnums=(0, 1, 2),
    )(x, gamma, beta)
    assert g[0].dtype == jnp.bfloat16
    assert g[1].dtype == jnp.bfloat16
    assert g[2].dtype == jnp.bfloat16
