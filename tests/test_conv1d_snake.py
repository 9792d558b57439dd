"""Parity tests for the fused snake→conv1d Pallas kernel.

The kernel (ops/kernels/conv1d_snake.py) must match snake_beta ∘ conv1d
exactly up to f32 reduction order: same fast-sin2 polynomial, f32 MXU
accumulation. On CPU these run in Pallas interpret mode; the module-level
dispatch gate (TPU-only) is covered by the plumbing tests, which exercise
the same `pre_snake` code paths through their CPU fallback.

Reference behavior: every Oobleck/DAC conv is preceded by a per-channel
snake (stable_audio_tools/models/autoencoders.py:97-153).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.ops.activations import snake_beta
from stable_audio_tools_tpu.ops.conv import conv1d, conv_transpose1d
from stable_audio_tools_tpu.ops.kernels.conv1d_snake import snake_conv1d


def _mk(rng, B, L, Ci, Co, k):
    x = jnp.asarray(rng.standard_normal((B, L, Ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, Ci, Co)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.1, jnp.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal(Ci)) + 0.3, jnp.float32)
    beta = jnp.asarray(np.abs(rng.standard_normal(Ci)) + 0.3, jnp.float32)
    return x, w, b, alpha, beta


@pytest.mark.parametrize("k,d,L", [(7, 1, 700), (7, 3, 700), (1, 1, 600),
                                   (2, 1, 64)])
def test_kernel_matches_unfused(k, d, L):
    rng = np.random.default_rng(0)
    x, w, b, alpha, beta = _mk(rng, 2, L, 128, 128, k)
    pad = (d * (k - 1)) // 2

    ref = conv1d(snake_beta(x, alpha, beta), w, b, padding=pad, dilation=d)
    got = snake_conv1d(x, w, b, alpha, beta, pad, pad, d)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def loss_ref(x, w, b, a, be):
        y = conv1d(snake_beta(x, a, be), w, b, padding=pad, dilation=d)
        return jnp.sum(jnp.sin(y))

    def loss_got(x, w, b, a, be):
        return jnp.sum(jnp.sin(snake_conv1d(x, w, b, a, be, pad, pad, d)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, alpha, beta)
    gg = jax.grad(loss_got, argnums=(0, 1, 2, 3, 4))(x, w, b, alpha, beta)
    for name, a_, b_ in zip(["dx", "dW", "db", "dalpha", "dbeta"], gr, gg):
        scale = float(jnp.max(jnp.abs(a_))) + 1e-12
        np.testing.assert_allclose(
            b_, a_, atol=2e-6 * scale, rtol=1e-5, err_msg=name)


def test_asymmetric_padding():
    rng = np.random.default_rng(1)
    x, w, b, alpha, beta = _mk(rng, 1, 300, 128, 256, 4)
    ref = conv1d(jnp.pad(snake_beta(x, alpha, beta), ((0, 0), (1, 2), (0, 0))),
                 w, b, padding=0)
    got = snake_conv1d(x, w, b, alpha, beta, 1, 2, 1)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [2, 4])
def test_conv1d_pre_snake_plumbing_strided(stride):
    """conv1d(pre_snake=...) == snake then conv for the s2d strided path."""
    rng = np.random.default_rng(2)
    k = 2 * stride
    x, w, b, alpha, beta = _mk(rng, 2, 256, 128, 256, k)
    pad = -(-stride // 2)
    ref = conv1d(snake_beta(x, alpha, beta), w, b, stride=stride, padding=pad)
    got = conv1d(x, w, b, stride=stride, padding=pad,
                 pre_snake=(alpha, beta))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [2, 4])
def test_conv_transpose1d_pre_snake_plumbing(stride):
    rng = np.random.default_rng(3)
    k = 2 * stride
    x, w, b, alpha, beta = _mk(rng, 2, 96, 128, 128, k)
    pad = -(-stride // 2)
    ref = conv_transpose1d(snake_beta(x, alpha, beta), w, b, stride=stride,
                           padding=pad)
    got = conv_transpose1d(x, w, b, stride=stride, padding=pad,
                           pre_snake=(alpha, beta))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("k,d,Co", [(7, 1, 128), (7, 3, 256), (1, 1, 128)])
def test_plain_wgrad_kernel_matches_tap_slice(k, d, Co):
    """conv1d_wgrad (streaming Pallas, interpret) == tap-sliced dW."""
    from stable_audio_tools_tpu.ops.kernels.conv1d_snake import conv1d_wgrad

    rng = np.random.default_rng(4)
    B, L, Ci = 2, 700, 128
    pad = (d * (k - 1)) // 2
    x = jnp.asarray(rng.standard_normal((B, L, Ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, Ci, Co)) * 0.05, jnp.float32)
    dy_len = L + 2 * pad - (d * (k - 1) + 1) + 1
    dy = jnp.asarray(rng.standard_normal((B, dy_len, Co)), jnp.float32)

    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    ref = jnp.stack([
        jax.lax.dot_general(
            jax.lax.dynamic_slice_in_dim(xp, j * d, dy_len, 1), dy,
            (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
        for j in range(k)
    ], 0)
    got = conv1d_wgrad(dy, x, (k, Ci, Co), pad, pad, d, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-12
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=1e-5)


def test_wgrad_co_blocking(monkeypatch):
    """Accumulator Co-splitting (CoB < Co) gives identical results."""
    import stable_audio_tools_tpu.ops.kernels.conv1d_snake as m

    rng = np.random.default_rng(5)
    B, L, Ci, Co, k = 1, 300, 128, 256, 7
    x = jnp.asarray(rng.standard_normal((B, L, Ci)), jnp.float32)
    dy_len = L + 6 - 6
    dy = jnp.asarray(rng.standard_normal((B, dy_len, Co)), jnp.float32)
    full = m.conv1d_wgrad(dy, x, (k, Ci, Co), 3, 3, 1, interpret=True)
    monkeypatch.setattr(m, "_MAX_ACC_BYTES", k * Ci * 128 * 4)
    assert m._pick_cob(k, Ci, Co) == 128
    split = m.conv1d_wgrad(dy, x, (k, Ci, Co), 3, 3, 1, interpret=True)
    # differing matmul lane widths reorder the f32 reduction
    scale = float(jnp.max(jnp.abs(full))) + 1e-12
    np.testing.assert_allclose(split, full, atol=1e-5 * scale, rtol=1e-5)


def test_module_param_paths_unchanged():
    """act_then_conv keeps the exact param tree of act(x); conv(x)."""
    from stable_audio_tools_tpu.models.autoencoders import (
        OobleckDecoder, OobleckEncoder)

    enc = OobleckEncoder(channels=16, latent_dim=8, c_mults=(1, 2),
                         strides=(2, 2), use_snake=True)
    x = jnp.zeros((1, 64, 2))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    paths = sorted(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0])
    # snake params live under the auto-named SnakeBeta module, convs under
    # their explicit names — the layout the torch importer maps onto
    assert any("SnakeBeta_0" in p and "alpha" in p for p in paths), paths[:8]
    assert any("res_0" in p and "conv1" in p for p in paths)

    dec = OobleckDecoder(out_channels=2, channels=16, latent_dim=8,
                         c_mults=(1, 2), strides=(2, 2), use_snake=True)
    z = jnp.zeros((1, 16, 8))
    dparams = dec.init(jax.random.PRNGKey(0), z)["params"]
    dpaths = sorted(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(dparams)[0])
    assert any("block_0" in p and "up" in p for p in dpaths)
    assert any("SnakeBeta" in p and "beta" in p for p in dpaths)


def test_tiny_beta_padding_rows_exact_zero():
    """Snake evaluated on the conv's zero padding must contribute EXACTLY 0.

    The fast-sin2 polynomial at x=0 is only ~4e-11, amplified by
    1/(beta+1e-9); with beta ~ 1e-9 that is ~0.02 per padded tap. Unfused,
    padding is applied AFTER the activation and contributes exact 0; the
    fused kernels mask padding rows (advisor round-4 finding). x = 0 input
    makes valid-row contributions identical in both paths (same polynomial),
    so any boundary-tap difference isolates the padding rows."""
    from stable_audio_tools_tpu.ops.activations import _snake_fast

    # reference = polynomial snake (what the fused kernel computes on valid
    # rows) with padding applied AFTER the activation -> exact-0 pad rows
    def snake_poly(x, a, be):
        return _snake_fast(x, a, be)

    rng = np.random.default_rng(7)
    _, w, _, alpha, _ = _mk(rng, 1, 300, 128, 128, 7)
    x = jnp.zeros((1, 300, 128), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    beta = jnp.full((128,), 1e-9, jnp.float32)
    pad = 3
    ref = conv1d(snake_poly(x, alpha, beta), w, b, padding=pad)
    got = snake_conv1d(x, w, b, alpha, beta, pad, pad, 1)
    # pre-fix, position 0 carried ~3 rows x 128 ch x 0.02 x w ~ 0.4 of
    # spurious padding signal; interior scale here is ~1
    np.testing.assert_allclose(got[:, :8], ref[:, :8], atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(got[:, -8:], ref[:, -8:], atol=1e-3, rtol=1e-5)

    # wgrad kernel applies the same mask: dW must match the unfused dW
    dy = jnp.asarray(rng.standard_normal((1, 300, 128)), jnp.float32)

    def loss_got(w_):
        return jnp.sum(dy * snake_conv1d(x, w_, b, alpha, beta, pad, pad, 1))

    def loss_ref(w_):
        return jnp.sum(dy * conv1d(snake_poly(x, alpha, beta), w_, b, padding=pad))

    gw = jax.grad(loss_got)(w)
    rw = jax.grad(loss_ref)(w)
    scale = float(jnp.max(jnp.abs(rw))) + 1e-12
    np.testing.assert_allclose(gw, rw, atol=1e-4 * scale, rtol=1e-4)


def test_big_channel_co_blocked_forward_and_fallback_bwd():
    """7x1024x1024 weights (14.7 MB bf16) exceed the VMEM budget: the
    forward sweeps Co in blocks (x blocks resident); the dx backward falls
    back to XLA dgrad + the snake's analytic vjp; wgrad still streams.
    Round-5: the SA-Open decode's mid-rate 1024/2048-channel convs ran at
    30 TF/s through XLA before this."""
    rng = np.random.default_rng(11)
    B, L, C, k = 1, 96, 1024, 7
    x = jnp.asarray(rng.standard_normal((B, L, C)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, C, C)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.3, jnp.float32)
    beta = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.3, jnp.float32)

    from stable_audio_tools_tpu.ops.kernels.conv1d_snake import _fwd_cob
    assert _fwd_cob(k, C, C) not in (None, C)  # actually blocks

    ref = conv1d(snake_beta(x, alpha, beta), w, b, padding=3)
    got = snake_conv1d(x, w, b, alpha, beta, 3, 3, 1)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)

    def loss(fn):
        def f(x, w, b, a, be):
            return jnp.sum(jnp.sin(fn(x, w, b, a, be)))
        return f

    gr = jax.grad(loss(lambda x, w, b, a, be: conv1d(
        snake_beta(x, a, be), w, b, padding=3)), argnums=(0, 1, 2, 3, 4))(
        x, w, b, alpha, beta)
    gg = jax.grad(loss(lambda x, w, b, a, be: snake_conv1d(
        x, w, b, a, be, 3, 3, 1)), argnums=(0, 1, 2, 3, 4))(
        x, w, b, alpha, beta)
    for name, a_, b_ in zip(["dx", "dW", "db", "dalpha", "dbeta"], gr, gg):
        scale = float(jnp.max(jnp.abs(a_))) + 1e-12
        np.testing.assert_allclose(b_, a_, atol=1e-5 * scale, rtol=1e-4,
                                   err_msg=name)


def test_fwd_plan_vmem_decisions_pinned():
    """Pin _fwd_plan's block/cob choices: the scoped-VMEM ceiling is
    empirical (k=1 ci=512 bl=2048 allocated 16.34M on v5e and failed to
    compile; bl=1024 compiles), so planner regressions break real-chip
    compiles that CPU tests can't catch. Also pin the dispatch gate's
    rejections."""
    from stable_audio_tools_tpu.ops.kernels.conv1d_snake import (
        _MAX_W_BYTES, _fwd_plan)

    # audio-rate narrow channels: big blocks
    bl, cob = _fwd_plan(7, 128, 128, 1, 32768)
    assert bl == 4096 and cob == 128
    # the empirical ceiling: bl*ci must stay <= 512K elements
    for k, ci, co, l in [(1, 512, 512, 65536), (7, 512, 512, 4096),
                         (7, 1024, 1024, 8192), (1, 2048, 2048, 1024)]:
        plan = _fwd_plan(k, ci, co, 1, l)
        assert plan is not None, (k, ci)
        assert plan[0] * ci <= 512 * 1024, (k, ci, plan)
    # s2d-folded strided convs: no VMEM-feasible configuration
    assert _fwd_plan(2, 8192, 2048, 1, 1024) is None
    # big-channel weights exceed _MAX_W_BYTES -> cob splits (direct-call
    # path only; snake_conv1d_supported keeps these on XLA)
    bl, cob = _fwd_plan(7, 1024, 1024, 1, 8192)
    assert cob < 1024 and 7 * 1024 * cob * 2 <= _MAX_W_BYTES


def test_residual_epilogue_matches_unfused():
    """snake_conv1d_res == conv1d(snake(x)) + bias + residual, values and
    all grads (the codec ResidualUnit's skip add, fused round 5)."""
    from stable_audio_tools_tpu.ops.kernels.conv1d_snake import (
        snake_conv1d_res)

    rng = np.random.default_rng(21)
    x, w, b, alpha, beta = _mk(rng, 2, 700, 128, 128, 7)
    res = jnp.asarray(rng.standard_normal((2, 700, 128)), jnp.float32)
    ref = conv1d(snake_beta(x, alpha, beta), w, b, padding=3) + res
    got = snake_conv1d_res(x, w, b, alpha, beta, res, 3, 3, 1)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def loss_ref(x, w, b, a, be, r):
        return jnp.sum(jnp.sin(conv1d(snake_beta(x, a, be), w, b,
                                      padding=3) + r))

    def loss_got(x, w, b, a, be, r):
        return jnp.sum(jnp.sin(snake_conv1d_res(x, w, b, a, be, r, 3, 3, 1)))

    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(x, w, b, alpha, beta, res)
    gg = jax.grad(loss_got, argnums=tuple(range(6)))(x, w, b, alpha, beta, res)
    for name, a_, b_ in zip(["dx", "dW", "db", "dalpha", "dbeta", "dres"],
                            gr, gg):
        scale = float(jnp.max(jnp.abs(a_))) + 1e-12
        # dres = cos(y): inherits the forward's f32 reduction-order diff
        atol = (3e-5 if name == "dres" else 2e-6) * scale
        np.testing.assert_allclose(b_, a_, atol=atol, rtol=1e-5,
                                   err_msg=name)
