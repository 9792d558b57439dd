"""LM stack tests: codebook patterns, model, generation, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.codebook_patterns import (
    CoarseFirstPattern,
    DelayedPatternProvider,
    MusicLMPattern,
    ParallelPatternProvider,
    UnrolledPatternProvider,
)
from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.models.lm import lm_generate
from stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config

SPECIAL = 99


@pytest.mark.parametrize("provider_cls,kwargs", [
    (DelayedPatternProvider, {}),
    (ParallelPatternProvider, {}),
    (UnrolledPatternProvider, {}),
    (MusicLMPattern, {"group_by": 2}),
])
def test_pattern_build_revert_roundtrip(provider_cls, kwargs):
    K, T, B = 4, 12, 2
    provider = provider_cls(K, **kwargs)
    pattern = provider.get_pattern(T)
    codes = jnp.asarray(np.random.RandomState(0).randint(0, 64, (B, K, T)))
    seq, idx, mask = pattern.build_pattern_sequence(codes, SPECIAL)
    assert seq.shape == (B, K, pattern.S)
    reverted, _, rmask = pattern.revert_pattern_sequence(seq, SPECIAL)
    # every (k, t) covered by the pattern must roundtrip exactly
    rm = np.asarray(rmask)
    np.testing.assert_array_equal(
        np.asarray(reverted)[:, rm], np.asarray(codes)[:, rm]
    )


def test_delayed_pattern_structure():
    provider = DelayedPatternProvider(3)
    pattern = provider.get_pattern(8)
    assert pattern.S == 8 + 2  # max delay K-1
    codes = jnp.arange(24).reshape(1, 3, 8)
    seq, _, _ = pattern.build_pattern_sequence(codes, SPECIAL)
    s = np.asarray(seq)[0]
    # codebook 0 has no delay; codebook 2 delayed by 2
    assert s[0, 0] == 0
    assert s[1, 0] == SPECIAL and s[1, 1] == 8
    assert s[2, 0] == SPECIAL and s[2, 1] == SPECIAL and s[2, 2] == 16


def test_coarse_first_pattern():
    provider = CoarseFirstPattern(3)
    pattern = provider.get_pattern(4)
    codes = jnp.arange(12).reshape(1, 3, 4)
    seq, _, _ = pattern.build_pattern_sequence(codes, SPECIAL)
    s = np.asarray(seq)[0]
    np.testing.assert_array_equal(s[0, :4], [0, 1, 2, 3])
    assert np.all(s[1, :4] == SPECIAL)


TINY_LM_CONFIG = {
    "model_type": "lm",
    "sample_size": 2048,
    "sample_rate": 16000,
    "audio_channels": 1,
    "model": {
        "pretransform": {
            "type": "autoencoder",
            "config": {
                "encoder": {"type": "oobleck", "config": {
                    "in_channels": 1, "channels": 8, "c_mults": [1, 2],
                    "strides": [4, 4], "latent_dim": 4, "use_snake": True}},
                "decoder": {"type": "oobleck", "config": {
                    "out_channels": 1, "channels": 8, "c_mults": [1, 2],
                    "strides": [4, 4], "latent_dim": 4, "use_snake": True}},
                "bottleneck": {"type": "fsq", "config": {"levels": [8, 8, 8, 8]}},
                "latent_dim": 4,
                "downsampling_ratio": 16,
                "io_channels": 1,
            },
        },
        "conditioning": {
            "configs": [{"id": "seconds_total", "type": "number",
                         "config": {"min_val": 0, "max_val": 64}}],
            "cond_dim": 16,
        },
        "lm": {
            "type": "continuous_transformer",
            "codebook_pattern": {"type": "delay"},
            "cross_attention_cond_ids": ["seconds_total"],
            "config": {"embed_dim": 32, "depth": 1, "num_heads": 2,
                       "cross_attn_cond_dim": 16, "use_checkpointing": False},
        },
    },
    "training": {"learning_rate": 1e-3},
}


@pytest.fixture(scope="module")
def lm_setup():
    model = create_model_from_config(TINY_LM_CONFIG)
    assert model.num_quantizers == 1
    assert model.codebook_size == 8 ** 4
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(
        jnp.asarray, mc.gather_inputs([{"seconds_total": 4.0}])
    )
    codes = jnp.zeros((1, 1, 16), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        codes, cond=prepared,
    )
    # also init pretransform params
    audio = jnp.zeros((1, 1, 256))
    pt_vars = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        audio, method=model.pretransform_tokenize,
    )
    variables = {"params": {**pt_vars["params"], **variables["params"]}}
    return model, variables, prepared


def test_lm_forward_and_logits(lm_setup):
    model, variables, prepared = lm_setup
    codes = jnp.asarray(np.random.RandomState(1).randint(0, 100, (1, 1, 16)))
    logits = model.apply(variables, codes, cond=prepared)
    assert logits.shape == (1, 1, 16, 8 ** 4)

    logits2, mask = model.apply(
        variables, codes, cond=prepared, method=model.compute_logits
    )
    assert logits2.shape == (1, 1, 16, 8 ** 4)
    assert mask.shape == (1, 1, 16)


def test_lm_generate(lm_setup):
    model, variables, prepared = lm_setup
    cond_tensors = model.apply(variables, prepared, method=model.run_conditioner)
    codes = lm_generate(
        model, variables, conditioning_tensors=cond_tensors,
        max_gen_len=8, batch_size=1, top_k=16, rng=jax.random.PRNGKey(0),
    )
    assert codes.shape == (1, 1, 8)
    assert int(codes.min()) >= 0 and int(codes.max()) < 8 ** 4

    # CFG path
    codes_cfg = lm_generate(
        model, variables, conditioning_tensors=cond_tensors,
        max_gen_len=8, cfg_scale=2.0, top_k=16, rng=jax.random.PRNGKey(1),
    )
    assert codes_cfg.shape == (1, 1, 8)


def test_lm_training_step(lm_setup):
    model, variables, prepared = lm_setup
    trainer = create_training_wrapper_from_config(TINY_LM_CONFIG, model)
    state = trainer.init_state(variables)
    step = jax.jit(trainer.make_train_step())
    batch = {
        "audio": jnp.asarray(
            np.random.RandomState(2).randn(2, 1, 256).astype(np.float32) * 0.1
        ),
        "prepared_cond": jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, x]), prepared
        ),
    }
    losses = []
    for i in range(6):
        state, aux = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
        assert np.isfinite(losses[-1])
        assert "perplexity" in aux and "ce_q0" in aux
    assert losses[-1] < losses[0], losses


def test_lm_generate_cached_matches_full(lm_setup):
    from stable_audio_tools_tpu.models.lm import lm_generate_cached

    model, variables, prepared = lm_setup
    cond_tensors = model.apply(variables, prepared, method=model.run_conditioner)
    kwargs = dict(conditioning_tensors=cond_tensors, max_gen_len=8,
                  top_k=0, temp=1e-6, rng=jax.random.PRNGKey(0))
    full = lm_generate(model, variables, **kwargs)
    cached = lm_generate_cached(model, variables, **kwargs)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))

    cached_cfg = lm_generate_cached(
        model, variables, conditioning_tensors=cond_tensors, max_gen_len=8,
        cfg_scale=2.0, top_k=16, rng=jax.random.PRNGKey(1),
    )
    assert cached_cfg.shape == (1, 1, 8)


@pytest.mark.slow
def test_lm_generate_cached_int8_weight_quant(lm_setup):
    """Opt-in int8 weight-only decode: same program shape, tokens mostly
    agree with the bf16 path under greedy sampling."""
    from stable_audio_tools_tpu.models.lm import lm_generate_cached

    model, variables, prepared = lm_setup
    cond_tensors = model.apply(variables, prepared, method=model.run_conditioner)
    kwargs = dict(conditioning_tensors=cond_tensors, max_gen_len=16,
                  top_k=0, temp=1e-6, rng=jax.random.PRNGKey(5))
    g_bf16 = lm_generate_cached(model, variables, **kwargs)
    g_int8 = lm_generate_cached(model, variables, weight_quant="int8",
                                **kwargs)
    assert g_int8.shape == g_bf16.shape
    assert g_int8.dtype == g_bf16.dtype
    agree = float(np.mean(np.asarray(g_int8) == np.asarray(g_bf16)))
    # greedy decode on a random-init model is the worst case for quant
    # noise; require substantial (not exact) agreement
    assert agree > 0.5, f"greedy token agreement {agree}"


def test_concat_kernel_requires_layout_marker():
    """concat_kernel=True on UNpermuted variables must fall back to the
    exact interleaved path (the layout marker, not the call site, selects
    the concat read) — regression for silent layout corruption via
    lm_forward(caches=...) with plain variables."""
    from stable_audio_tools_tpu.ops.attention import InterleavedFusedProj

    h, dh = 4, 8
    m = InterleavedFusedProj(3 * h * dh, 3, dh)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 16).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)  # interleaved layout, explicit split path

    # no marker: concat request is ignored, result identical
    got = m.apply(params, x, concat_kernel=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # permuted kernel + marker: concat fast path, same values
    k = params["params"]["kernel"]
    din = k.shape[0]
    kc = (k.reshape(din, h, 3, dh).transpose(0, 2, 1, 3)
          .reshape(din, 3 * h * dh))
    vars2 = {"params": {"kernel": kc}, "layout": {"concat": True}}
    got2 = m.apply(vars2, x, concat_kernel=True)
    for a, b in zip(got2, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_permute_fused_kernels_skips_non_backbone_and_stamps_layout():
    from stable_audio_tools_tpu.models.lm import permute_fused_kernels_to_concat

    k_bb = jnp.arange(16 * 24, dtype=jnp.float32).reshape(16, 24)
    k_codec = k_bb + 1000.0
    variables = {"params": {
        "backbone": {"layers_0": {"self_attn": {"to_qkv": {"kernel": k_bb}}}},
        "pretransform": {"blk": {"self_attn": {"to_qkv": {"kernel": k_codec}}}},
    }}
    out = permute_fused_kernels_to_concat(variables, num_heads=2, dim_heads=4)
    # codec kernel untouched
    np.testing.assert_array_equal(
        np.asarray(out["params"]["pretransform"]["blk"]["self_attn"]["to_qkv"]["kernel"]),
        np.asarray(k_codec))
    # backbone kernel permuted + marker stamped at the same module path
    assert not np.array_equal(
        np.asarray(out["params"]["backbone"]["layers_0"]["self_attn"]["to_qkv"]["kernel"]),
        np.asarray(k_bb))
    assert out["layout"]["backbone"]["layers_0"]["self_attn"]["to_qkv"]["concat"]


def test_x_transformers_backbone_validation():
    """x-transformers configs map onto the ContinuousTransformer backbone with
    kwarg validation — unsupported options error instead of silently aliasing
    (reference lm_backbone.py:42-100; VERDICT r2 item 10)."""
    import copy

    cfg = copy.deepcopy(TINY_LM_CONFIG)
    lm_cfg = cfg["model"]["lm"]
    lm_cfg["type"] = "x-transformers"
    # x-transformers Decoder-style keys: dim/heads + reference-default opts
    lm_cfg["config"] = {"dim": 32, "depth": 1, "heads": 2,
                        "cross_attn_cond_dim": 16, "use_checkpointing": False,
                        "attn_flash": True, "rotary_pos_emb": True,
                        "ff_glu": True, "attn_dropout": 0.0}
    model = create_model_from_config(cfg)
    assert model.lm.backbone.embed_dim == 32
    assert model.lm.backbone.num_heads == 2

    # an exotic x-transformers option must be rejected loudly
    bad = copy.deepcopy(cfg)
    bad["model"]["lm"]["config"]["attn_talking_heads"] = True
    with pytest.raises(NotImplementedError, match="attn_talking_heads"):
        create_model_from_config(bad)

    # an equivalent-class option with the WRONG value must also be rejected
    bad2 = copy.deepcopy(cfg)
    bad2["model"]["lm"]["config"]["rotary_pos_emb"] = False
    with pytest.raises(NotImplementedError, match="rotary_pos_emb"):
        create_model_from_config(bad2)
