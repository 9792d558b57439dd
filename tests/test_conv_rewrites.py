"""Exactness tests for the dense strided/transposed conv rewrites.

conv1d_strided_s2d and conv_transpose1d_d2s (ops/conv.py) must match the
naive XLA strided / lhs-dilated convolutions bit-for-bit in math (f32,
same MACs in a different order → tolerance ~1e-5) for forward, input
gradient and weight gradient. Shapes cover every (kernel, stride, padding)
the Oobleck/DAC/SEANet codecs use (reference:
stable_audio_tools/models/autoencoders.py:57-355) plus non-divisible
k/s and odd-length cases.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.ops.conv import (
    DIMENSION_NUMBERS,
    conv1d_strided_s2d,
    conv_transpose1d_d2s,
)


def _naive_conv(x, k, stride, padding):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=DIMENSION_NUMBERS,
    )


def _naive_convT(x, k, stride, padding):
    kk = k.shape[0]
    return jax.lax.conv_general_dilated(
        x, jnp.flip(k, axis=0), window_strides=(1,),
        padding=[(kk - 1 - padding, kk - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=DIMENSION_NUMBERS,
    )


CASES = [
    # (L, Ci, Co, k, s, p) — codec down/up convs use k=2s, p=ceil(s/2)
    (64, 3, 5, 4, 2, 1),
    (64, 4, 6, 8, 4, 2),
    (128, 2, 4, 16, 8, 4),
    (96, 3, 3, 7, 3, 2),   # k not a multiple of s
    (50, 2, 3, 5, 4, 3),   # odd L, p > s/2
    (33, 5, 2, 6, 2, 0),   # no padding, odd L
]


@pytest.mark.parametrize("L,Ci,Co,k,s,p", CASES)
def test_strided_s2d_matches_naive(L, Ci, Co, k, s, p):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, L, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, Ci, Co), jnp.float32)

    ref = _naive_conv(x, w, s, p)
    got = conv1d_strided_s2d(x, w, stride=s, padding=p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    ct = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    gx_r, gw_r = jax.grad(
        lambda x_, w_: jnp.vdot(_naive_conv(x_, w_, s, p), ct), (0, 1))(x, w)
    gx_g, gw_g = jax.grad(
        lambda x_, w_: jnp.vdot(
            conv1d_strided_s2d(x_, w_, stride=s, padding=p), ct), (0, 1))(x, w)
    np.testing.assert_allclose(gx_g, gx_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw_g, gw_r, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("L,Ci,Co,k,s,p", CASES)
def test_transpose_d2s_matches_naive(L, Ci, Co, k, s, p):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, L, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, Ci, Co), jnp.float32)

    ref = _naive_convT(x, w, s, p)
    got = conv_transpose1d_d2s(x, w, stride=s, padding=p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    ct = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    gx_r, gw_r = jax.grad(
        lambda x_, w_: jnp.vdot(_naive_convT(x_, w_, s, p), ct), (0, 1))(x, w)
    gx_g, gw_g = jax.grad(
        lambda x_, w_: jnp.vdot(
            conv_transpose1d_d2s(x_, w_, stride=s, padding=p), ct), (0, 1))(x, w)
    np.testing.assert_allclose(gx_g, gx_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw_g, gw_r, rtol=1e-4, atol=1e-4)


def test_bias_paths():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 4), jnp.float32)
    w = jnp.asarray(rng.randn(8, 4, 6), jnp.float32)
    b = jnp.asarray(rng.randn(6), jnp.float32)
    np.testing.assert_allclose(
        conv1d_strided_s2d(x, w, b, stride=4, padding=2),
        _naive_conv(x, w, 4, 2) + b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        conv_transpose1d_d2s(x, w, b, stride=4, padding=2),
        _naive_convT(x, w, 4, 2) + b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "k,d,pad",
    [(7, 1, 3), (7, 3, 9), (7, 9, 27), (1, 1, 0), (3, 1, "causal"),
     (5, 2, "same"), (4, 1, 1)],
)
def test_custom_vjp_grads_match_xla(k, d, pad):
    """conv1d's custom VJP (tap-sliced matmul dW, explicit dx conv) must
    match jax.grad through the raw XLA conv to f32 reduction-order noise."""
    from stable_audio_tools_tpu.ops import conv as conv_mod

    rng = np.random.RandomState(0)
    B, L, Ci, Co = 2, 257, 8, 12
    x = jnp.asarray(rng.randn(B, L, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(k, Ci, Co) * 0.2, jnp.float32)
    dy_seed = jnp.asarray(rng.randn(1), jnp.float32)

    def loss_via(fn):
        def f(x, w):
            out = fn(x, w)
            return jnp.sum(jnp.sin(out * 0.1) * dy_seed)
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    custom = loss_via(
        lambda x, w: conv_mod.conv1d(x, w, padding=pad, dilation=d))
    if isinstance(pad, int):
        plo = phi = pad
    elif pad == "same":
        t = (k - 1) * d
        plo, phi = t // 2, t - t // 2
    else:  # causal
        plo, phi = (k - 1) * d, 0
    raw = loss_via(
        lambda x, w: conv_mod._conv1d_raw(x, w, plo, phi, d))

    (lc, (dxc, dwc)) = custom(x, w)
    (lr, (dxr, dwr)) = raw(x, w)
    assert np.allclose(lc, lr, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dxc, dxr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dwc, dwr, rtol=1e-5, atol=1e-4)


def test_custom_vjp_under_vmap_and_scan():
    """The custom-VJP conv must stay correct under vmap and lax.map (the
    chunked-decode path wraps codec convs in lax.map)."""
    from stable_audio_tools_tpu.ops import conv as conv_mod

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 2, 65, 8), jnp.float32)
    w = jnp.asarray(rng.randn(7, 8, 8) * 0.2, jnp.float32)

    def one(xi, w):
        return conv_mod.conv1d(xi, w, padding=3, dilation=3)

    def loss(x, w, mapper):
        return jnp.sum(mapper(lambda xi: one(xi, w), x) ** 2)

    for mapper in (lambda f, xs: jax.vmap(f)(xs), jax.lax.map):
        g = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
            x, w, mapper)
        gr = jax.jit(
            jax.grad(
                lambda x, w: jnp.sum(
                    jax.vmap(
                        lambda xi: conv_mod._conv1d_raw(xi, w, 3, 3, 3)
                    )(x) ** 2
                ),
                argnums=(0, 1),
            )
        )(x, w)
        np.testing.assert_allclose(g[0], gr[0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(g[1], gr[1], rtol=1e-5, atol=1e-4)
