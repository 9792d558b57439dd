"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.ops.attention import dot_product_attention
from stable_audio_tools_tpu.ops.kernels.flash_attention import flash_attention

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier


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


@pytest.mark.parametrize("causal,window,use_rope", [
    (True, None, True), (False, None, True),
    (False, (63, 64), False), (True, None, False),
])
def test_fused_qkv_matches_reference(causal, window, use_rope):
    """flash_attention_fused_qkv (index-map unpack + in-kernel RoPE) must
    match the pure-jax unpack+rope+SDPA reference, values and grads."""
    from stable_audio_tools_tpu.ops.attention import dot_product_attention
    from stable_audio_tools_tpu.ops.embeddings import (
        apply_rotary_pos_emb, rotary_freqs,
    )
    from stable_audio_tools_tpu.ops.kernels.flash_attention import (
        flash_attention_fused_qkv,
    )

    B, N, H, D = 1, 512, 2, 64
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, 3, D),
                            jnp.float32)
    if use_rope:
        freqs = rotary_freqs(N, 32)
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    else:
        freqs = cos = sin = None

    def ref(qkv):
        q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)
        if use_rope:
            q = apply_rotary_pos_emb(q, freqs)
            k = apply_rotary_pos_emb(k, freqs)
        return dot_product_attention(q, k, v, causal=causal, window=window)

    def fused(qkv):
        return flash_attention_fused_qkv(qkv, cos, sin, causal, window)

    out_ref = ref(qkv)
    out_fused = fused(qkv)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-3, atol=2e-3)

    ct = jax.random.normal(jax.random.PRNGKey(1), out_ref.shape, jnp.float32)
    g_ref = jax.grad(lambda q: jnp.sum(ref(q) * ct))(qkv)
    g_fused = jax.grad(lambda q: jnp.sum(fused(q) * ct))(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("N,P", [
    (1025, 1),    # SA-Open DiT: 1 global-cond token + 1024 latents
    (1040, 16),   # prepend_cond + memory tokens
    (515, 3),
])
def test_prefix_split_matches_full(N, P):
    from stable_audio_tools_tpu.ops.kernels.flash_attention import (
        flash_attention_prefix, prefix_split_profitable)
    assert prefix_split_profitable(N, P)
    rng = np.random.RandomState(3)
    B, H, D = 1, 2, 64
    q, k, v = (jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
               for _ in range(3))
    out_p = flash_attention_prefix(q, k, v, P)
    out_x = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-3, atol=1e-4)


def test_prefix_split_profitability_gate():
    from stable_audio_tools_tpu.ops.kernels.flash_attention import (
        prefix_split_profitable)
    assert not prefix_split_profitable(1024, 0)     # no prefix
    assert not prefix_split_profitable(1536, 512)   # long prefix: dense blowup
    assert not prefix_split_profitable(1024, 1)     # 1023 pads back to 1024
    assert prefix_split_profitable(1025, 1)


def test_prefix_split_grads():
    from stable_audio_tools_tpu.ops.kernels.flash_attention import (
        flash_attention_prefix)
    rng = np.random.RandomState(4)
    B, H, N, P, D = 1, 2, 515, 3, 64
    q, k, v = (jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
               for _ in range(3))
    w = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))

    def loss_p(q, k, v):
        return jnp.sum(w * flash_attention_prefix(q, k, v, P) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(w * dot_product_attention(q, k, v) ** 2)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_gqa_repeat_flash_grads_match_xla():
    """GQA reaches the kernel as a kv-head repeat (ops/attention.py:365);
    grads must flow back through the repeat to the UNrepeated k/v exactly as
    in the XLA path. (q_len != k_len never reaches the kernel: cross-attn
    dispatches to XLA by design — _should_use_pallas requires q==k length.)"""
    rng = np.random.RandomState(5)
    B, Hq, Hkv, N, D = 1, 4, 2, 256, 64
    q = jnp.asarray(rng.randn(B, Hq, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Hkv, N, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Hkv, N, D).astype(np.float32))
    w = jnp.asarray(rng.randn(B, Hq, N, D).astype(np.float32))
    rep = Hq // Hkv

    def loss_p(q, k, v):
        kr, vr = jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1)
        return jnp.sum(w * flash_attention(q, kr, vr, True, None) ** 2)

    def loss_x(q, k, v):
        kr, vr = jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1)
        return jnp.sum(w * dot_product_attention(q, kr, vr, causal=True) ** 2)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_fused_qkv_grads_non_aligned_length():
    """N not a multiple of the block size: the backward must re-pad the
    sliced lse before reading it through padded BlockSpecs (regression for
    NaN grads from undefined lse pad rows)."""
    from stable_audio_tools_tpu.ops.kernels.flash_attention import (
        flash_attention_fused_qkv)

    rng = np.random.RandomState(6)
    B, N, H, D = 1, 300, 2, 64
    qkv = jnp.asarray(rng.randn(B, N, H, 3, D).astype(np.float32))
    w = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))

    def loss_fused(qkv):
        return jnp.sum(w * flash_attention_fused_qkv(qkv, None, None) ** 2)

    def loss_ref(qkv):
        q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)
        return jnp.sum(w * dot_product_attention(q, k, v) ** 2)

    g_fused = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    assert bool(jnp.all(jnp.isfinite(g_fused)))
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal,N,P", [
    (False, 256, 0),
    (True, 256, 0),
    (False, 300, 0),    # unpadded length
    (False, 256, 9),    # prefix fold (non-causal only)
])
def test_nhd_pair_matches_reference(causal, N, P):
    from stable_audio_tools_tpu.ops.kernels.flash_attention import (
        flash_attention_nhd,
    )

    rng = np.random.RandomState(7)
    B, H, D = 2, 4, 64
    q, k, v = (jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
               for _ in range(3))
    out_p = flash_attention_nhd(q, k, v, causal, P)
    # reference: standard layout attention on the transposed operands
    to_bhnd = lambda t: t.transpose(0, 2, 1, 3)
    if P > 0:
        # prefix rows attend densely; main rows attend to everything too
        # (non-causal full attention == plain attention over all N)
        out_x = dot_product_attention(to_bhnd(q), to_bhnd(k), to_bhnd(v),
                                      causal=False)
    else:
        out_x = dot_product_attention(to_bhnd(q), to_bhnd(k), to_bhnd(v),
                                      causal=causal)
    np.testing.assert_allclose(np.asarray(out_p),
                               np.asarray(out_x.transpose(0, 2, 1, 3)),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("causal,P", [(False, 0), (True, 0), (False, 9)])
def test_nhd_pair_grads(causal, P):
    from stable_audio_tools_tpu.ops.kernels.flash_attention import (
        flash_attention_nhd,
    )

    rng = np.random.RandomState(8)
    B, N, H, D = 1, 256, 2, 64
    q, k, v = (jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
               for _ in range(3))
    w = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    to_bhnd = lambda t: t.transpose(0, 2, 1, 3)

    def loss_p(q, k, v):
        return jnp.sum(w * flash_attention_nhd(q, k, v, causal, P) ** 2)

    def loss_x(q, k, v):
        out = dot_product_attention(to_bhnd(q), to_bhnd(k), to_bhnd(v),
                                    causal=causal).transpose(0, 2, 1, 3)
        return jnp.sum(w * out ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("qk_norm,use_rope,prefix,causal", [
    ("none", True, 0, False),
    ("ln", True, 1, False),
    ("l2", False, 9, False),
    ("none", True, 0, True),
])
def test_attention_nhd_dispatch_matches_standard(qk_norm, use_rope, prefix,
                                                 causal, monkeypatch):
    """The wired NHD branch in Attention (reshape + NHD qk-norm + NHD rotary
    + pair kernel) must match the standard split-head path bit-for-bit in
    semantics (same params, same math, different layout)."""
    import stable_audio_tools_tpu.ops.attention as attn_mod
    from stable_audio_tools_tpu.ops.embeddings import RotaryEmbedding

    rng = np.random.RandomState(11)
    B, N, dim, dh = 2, 256 + prefix, 256, 64
    m = attn_mod.Attention(dim=dim, dim_heads=dh, qk_norm=qk_norm,
                           causal=causal, prefix_len=prefix)
    x = jnp.asarray(rng.randn(B, N, dim).astype(np.float32))
    rot = RotaryEmbedding(dim=dh // 2)(N) if use_rope else None
    params = m.init(jax.random.PRNGKey(0), x, rotary_pos_emb=rot)

    ref = m.apply(params, x, rotary_pos_emb=rot)
    monkeypatch.setattr(attn_mod, "_should_use_nhd",
                        lambda *a, **k: True)
    out = m.apply(params, x, rotary_pos_emb=rot)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


# -- mesh shard_map dispatch (round 4) ---------------------------------------


def test_attention_core_shard_mapped_flash_matches_xla(monkeypatch):
    """Inside a mesh program, attention_core shard_maps the flash kernel
    (batch on 'data', heads on 'model') instead of falling back to XLA —
    forward and grads must match the XLA reference."""
    import stable_audio_tools_tpu.ops.attention as attn_mod
    from stable_audio_tools_tpu.parallel.mesh import (
        create_mesh, mesh_program_context)

    monkeypatch.setenv("SAT_FORCE_PALLAS_ATTN", "1")
    rng = np.random.RandomState(0)
    B, H, N, D = 8, 4, 512, 64
    q = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32)) * 0.3

    ref = dot_product_attention(q, k, v)

    def loss(q, k, v):
        return jnp.sum(attn_mod.attention_core(q, k, v) ** 2)

    g_ref = jax.grad(lambda q, k, v: jnp.sum(
        dot_product_attention(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)

    mesh = create_mesh(data=4, model=2)
    with mesh_program_context(mesh):
        out = jax.jit(attn_mod.attention_core)(q, k, v)
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_attention_nhd_dispatches_under_mesh(monkeypatch):
    """The NHD head-pair branch must fire inside a mesh program via
    shard_map when the local head count stays even, and match the non-mesh
    output; with an odd local head split it must fall back cleanly."""
    import stable_audio_tools_tpu.ops.attention as attn_mod
    from stable_audio_tools_tpu.parallel.mesh import (
        create_mesh, mesh_program_context)

    monkeypatch.setenv("SAT_FORCE_PALLAS_ATTN", "1")
    # force the gate: the profitability threshold starts at N=4096 (round-5
    # A/B), but this test is about the mesh shard_map dispatch mechanics
    monkeypatch.setattr(
        attn_mod, "_should_use_nhd",
        lambda n, h, kv_h, dim_heads, causal, prefix_len, mask, window:
        dim_heads * 2 == 128 and h % 2 == 0 and mask is None
        and window is None and not prefix_len)
    rng = np.random.RandomState(3)
    B, N, dim, dh = 8, 512, 256, 64  # h=4
    m = attn_mod.Attention(dim=dim, dim_heads=dh, prefix_len=0)
    x = jnp.asarray(rng.randn(B, N, dim).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)  # non-mesh: NHD fires (gate forced)

    mesh = create_mesh(data=4, model=2)  # local heads 4/2=2: even -> NHD
    with mesh_program_context(mesh):
        out = jax.jit(lambda p, x: m.apply(p, x))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    mesh_odd = create_mesh(data=2, model=4)  # local heads 1: falls back
    with mesh_program_context(mesh_odd):
        out2 = jax.jit(lambda p, x: m.apply(p, x))(params, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
