"""Golden tests for conv ops vs torch (CPU) — torch conv semantics parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stable_audio_tools_tpu.ops.conv import (
    conv1d,
    conv_transpose1d,
    WNConv1d,
    WNConvTranspose1d,
)


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("stride,padding,dilation,k", [
    (1, 0, 1, 7),
    (1, 3, 1, 7),
    (2, 1, 1, 4),
    (4, 2, 1, 8),
    (1, 9, 3, 7),
    (1, 27, 9, 7),
])
def test_conv1d_matches_torch(stride, padding, dilation, k):
    rng = np.random.RandomState(0)
    B, T, Cin, Cout = 2, 64, 5, 9
    x = rng.randn(B, T, Cin).astype(np.float32)
    w = rng.randn(Cout, Cin, k).astype(np.float32)  # torch layout OIK
    b = rng.randn(Cout).astype(np.float32)

    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        padding=padding,
        dilation=dilation,
    ).numpy().transpose(0, 2, 1)

    w_jax = jnp.asarray(w.transpose(2, 1, 0))  # OIK -> KIO (WIO)
    out = conv1d(jnp.asarray(x), w_jax, jnp.asarray(b), stride=stride,
                 padding=padding, dilation=dilation)
    np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding,k", [
    (1, 0, 3),
    (2, 1, 4),
    (4, 2, 8),
    (8, 4, 16),
])
def test_conv_transpose1d_matches_torch(stride, padding, k):
    rng = np.random.RandomState(1)
    B, T, Cin, Cout = 2, 32, 6, 4
    x = rng.randn(B, T, Cin).astype(np.float32)
    w = rng.randn(Cin, Cout, k).astype(np.float32)  # torch layout IOK
    b = rng.randn(Cout).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        padding=padding,
    ).numpy().transpose(0, 2, 1)

    w_jax = jnp.asarray(w.transpose(2, 0, 1))  # IOK -> KIO
    out = conv_transpose1d(jnp.asarray(x), w_jax, jnp.asarray(b), stride=stride,
                           padding=padding)
    assert out.shape == ref.shape
    np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-4)


def test_wnconv1d_weight_norm_semantics():
    """w = g * v/||v|| with norm over (k, in) per out channel, like torch."""
    rng = jax.random.PRNGKey(0)
    m = WNConv1d(features=8, kernel_size=7, padding=3)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 4).astype(np.float32))
    params = m.init(rng, x)
    out = m.apply(params, x)
    assert out.shape == (1, 32, 8)

    # At init g == ||v||, so effective kernel == v
    v = params["params"]["v"]
    g = params["params"]["g"]
    np.testing.assert_allclose(
        _np(g), _np(jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1)))), rtol=1e-5
    )

    # Scaling g by 2 scales output (bias removed) by 2
    p2 = jax.tree_util.tree_map(lambda a: a, params)
    p2 = {"params": dict(p2["params"])}
    p2["params"]["g"] = g * 2.0
    p2["params"]["bias"] = jnp.zeros_like(params["params"]["bias"])
    p1 = {"params": dict(params["params"])}
    p1["params"]["bias"] = jnp.zeros_like(params["params"]["bias"])
    out1 = m.apply(p1, x)
    out2 = m.apply(p2, x)
    np.testing.assert_allclose(_np(out2), _np(out1) * 2, rtol=1e-4, atol=1e-5)


def test_wnconvtranspose1d_shapes():
    m = WNConvTranspose1d(features=4, kernel_size=8, stride=4, padding=2)
    x = jnp.zeros((2, 16, 6))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # torch: (L-1)*s - 2p + k = 15*4 - 4 + 8 = 64
    assert out.shape == (2, 64, 4)


def test_sin2_fast_matches_sin_squared():
    # f32-grade accuracy of the TPU fast-snake polynomial incl. far from 0
    import numpy as np
    import jax.numpy as jnp
    from stable_audio_tools_tpu.ops.activations import sin2_fast

    z = jnp.asarray(np.linspace(-200.0, 200.0, 400001), jnp.float32)
    ref = np.sin(np.asarray(z, np.float64)) ** 2
    got = np.asarray(sin2_fast(z), np.float64)
    assert np.max(np.abs(got - ref)) < 5e-5


def test_snake_beta_fast_flag(monkeypatch):
    import numpy as np
    import jax.numpy as jnp
    from stable_audio_tools_tpu.ops import activations as A

    x = jnp.asarray(np.random.RandomState(0).randn(4, 64, 8), jnp.float32)
    a = jnp.asarray(np.exp(np.random.RandomState(1).randn(8) * 0.2), jnp.float32)
    b = jnp.asarray(np.exp(np.random.RandomState(2).randn(8) * 0.2), jnp.float32)
    exact = A.snake_beta(x, a, b)
    monkeypatch.setattr(A, "use_fast_sin2", lambda: True)
    fast = A.snake_beta(x, a, b)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-4, atol=1e-5)


def test_snake_beta_fast_custom_vjp_grads(monkeypatch):
    # The fast path's analytic custom VJP must match autodiff through the
    # exact jnp.sin formula for x, alpha and beta grads.
    import jax
    import numpy as np
    import jax.numpy as jnp
    from stable_audio_tools_tpu.ops import activations as A

    x = jnp.asarray(np.random.RandomState(0).randn(2, 513, 8) * 3, jnp.float32)
    a = jnp.asarray(np.exp(np.random.RandomState(1).randn(8) * 0.3), jnp.float32)
    b = jnp.asarray(np.exp(np.random.RandomState(2).randn(8) * 0.3), jnp.float32)
    ct = jnp.asarray(np.random.RandomState(3).randn(2, 513, 8), jnp.float32)

    def loss_exact(x, a, b):
        s = jnp.sin(x * a)
        return jnp.sum((x + (1.0 / (b + 1e-9)) * (s * s)) * ct)

    def loss_fast(x, a, b):
        return jnp.sum(A._snake_fast(x, a, b) * ct)

    ge = jax.grad(loss_exact, argnums=(0, 1, 2))(x, a, b)
    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(x, a, b)
    for e, f in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(f), np.asarray(e),
                                   rtol=2e-4, atol=2e-4)

    # bf16 in/out keeps bf16 cotangants and f32 param grads
    xb = x.astype(jnp.bfloat16)
    out, vjp = jax.vjp(A._snake_fast, xb, a, b)
    dx, da, db = vjp(out)
    assert out.dtype == jnp.bfloat16 and dx.dtype == jnp.bfloat16
    assert da.dtype == jnp.float32 and db.dtype == jnp.float32


def test_snake_fused_pallas_matches_jnp():
    # Pallas kernel (interpret mode off-TPU) == the jnp fast path, fwd+grads,
    # incl. a row count that doesn't divide the block size (tail masking)
    import jax
    import numpy as np
    import jax.numpy as jnp
    from stable_audio_tools_tpu.ops import activations as A
    from stable_audio_tools_tpu.ops.kernels.snake import snake_fused

    C = 128
    x = jnp.asarray(np.random.RandomState(0).randn(3, 347, C) * 2, jnp.float32)
    a = jnp.asarray(np.exp(np.random.RandomState(1).randn(C) * 0.3), jnp.float32)
    b = jnp.asarray(np.exp(np.random.RandomState(2).randn(C) * 0.3), jnp.float32)
    ct = jnp.asarray(np.random.RandomState(3).randn(3, 347, C), jnp.float32)

    got = snake_fused(x, a, b)
    want = A._snake_fast(x, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    gf = jax.grad(lambda *s: jnp.sum(snake_fused(*s) * ct), argnums=(0, 1, 2))
    gr = jax.grad(lambda *s: jnp.sum(A._snake_fast(*s) * ct), argnums=(0, 1, 2))
    for f, r in zip(gf(x, a, b), gr(x, a, b)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_conv2d_small_cin_custom_vjp_matches_xla():
    """Restructured small-Ci dgrad (matmul + overlap-add) == XLA autodiff."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from stable_audio_tools_tpu.ops.conv import (
        _conv2d_raw_nhwc, _conv2d_small_cin)

    rng = np.random.RandomState(0)
    for (kh, kw, dil, pads) in [(3, 9, 1, ((1, 1), (4, 4))),
                                (3, 5, 2, ((2, 2), (1, 3)))]:
        x = jnp.asarray(rng.randn(2, 23, 17, 8), jnp.float32)
        k = jnp.asarray(rng.randn(kh, kw, 8, 128) * 0.1, jnp.float32)
        ct_shape = _conv2d_raw_nhwc(x, k, pads, dil).shape
        ct = jnp.asarray(rng.randn(*ct_shape), jnp.float32)

        def loss_ref(x, k):
            return jnp.sum(_conv2d_raw_nhwc(x, k, pads, dil) * ct)

        def loss_got(x, k):
            return jnp.sum(_conv2d_small_cin(x, k, pads, dil) * ct)

        np.testing.assert_allclose(
            _conv2d_small_cin(x, k, pads, dil),
            _conv2d_raw_nhwc(x, k, pads, dil), rtol=1e-5, atol=1e-5)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
        gg = jax.grad(loss_got, argnums=(0, 1))(x, k)
        for name, a, b in zip(["dx", "dW"], gr, gg):
            scale = float(jnp.max(jnp.abs(a))) + 1e-12
            np.testing.assert_allclose(
                b, a, atol=2e-5 * scale, rtol=1e-4, err_msg=name)
