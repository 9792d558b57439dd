"""Conditioner tests: T5 (offline fallback), LUT, list, int, CLAP, multi."""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.conditioners import (
    CLAPTextConditioner,
    IntConditioner,
    ListConditioner,
    MultiConditioner,
    NumberConditioner,
    T5Conditioner,
    create_multi_conditioner_from_conditioning_config,
)


def _apply(host_cond, values, rng=0):
    prepared = host_cond.prepare(values)
    module = host_cond.make_module()
    prepared = jax.tree_util.tree_map(jnp.asarray, prepared)
    variables = module.init(jax.random.PRNGKey(rng), **prepared)
    return module.apply(variables, **prepared)


def test_int_conditioner():
    cond, mask = _apply(IntConditioner("x", output_dim=8, min_val=0, max_val=100),
                        [5, 50])
    assert cond.shape == (2, 1, 8)
    assert mask.shape == (2, 1)


def test_number_conditioner():
    cond, mask = _apply(NumberConditioner("x", output_dim=8, min_val=0, max_val=100),
                        [5.0, 99.0])
    assert cond.shape == (2, 1, 8)


def test_list_conditioner():
    c = ListConditioner("x", output_dim=8, options=["piano", "drums"])
    cond, _ = _apply(c, ["drums", "unknown"])
    assert cond.shape == (2, 1, 8)
    # unknown maps to index 0
    assert c.prepare(["unknown"])["ints"][0] == 0
    assert c.prepare(["piano"])["ints"][0] == 1


def test_t5_conditioner_requires_optin_for_random_init():
    """Without local weights, a T5 tower is a hard error unless the user
    opts into random init (VERDICT r1: no silent degradation)."""
    c = T5Conditioner("prompt", output_dim=32, t5_model_name="t5-base",
                      max_length=16)
    with pytest.raises(RuntimeError, match="allow_random_init"):
        c.prepare(["a dog barking"])


def test_clap_conditioners_require_optin_for_random_init():
    c = CLAPTextConditioner("prompt", output_dim=16)
    with pytest.raises(RuntimeError, match="allow_random_init"):
        c.prepare(["hello"])
    from stable_audio_tools_tpu.models.conditioners import CLAPAudioConditioner

    a = CLAPAudioConditioner("aud", output_dim=16)
    with pytest.raises(RuntimeError, match="allow_random_init"):
        a.prepare([np.zeros(100, np.float32)])


@pytest.mark.slow
def test_t5_conditioner_offline_fallback():
    """Zero-egress: T5 falls back to random init + hash tokenizer but keeps
    the full interface contract (embeddings + mask, learnable proj)."""
    c = T5Conditioner("prompt", output_dim=32, t5_model_name="t5-base",
                      max_length=16, allow_random_init=True)
    prepared = c.prepare(["a dog barking", "rain"])
    assert prepared["embeddings"].shape == (2, 16, 768)
    assert prepared["attention_mask"].shape == (2, 16)
    module = c.make_module()
    p = jax.tree_util.tree_map(jnp.asarray, prepared)
    variables = module.init(jax.random.PRNGKey(0), **p)
    cond, mask = module.apply(variables, **p)
    assert cond.shape == (2, 16, 32)
    # masked positions are zeroed
    np.testing.assert_allclose(
        np.asarray(cond)[~np.asarray(mask)], 0.0, atol=1e-6
    )


@pytest.mark.slow
def test_clap_text_conditioner_fallback():
    c = CLAPTextConditioner("prompt", output_dim=16, allow_random_init=True)
    cond, mask = _apply(c, ["hello", "world"])
    assert cond.shape == (2, 1, 16)


def test_multi_conditioner_default_keys():
    mc = create_multi_conditioner_from_conditioning_config({
        "cond_dim": 8,
        "default_keys": {"seconds_maybe": "seconds_total"},
        "configs": [
            {"id": "seconds_maybe", "type": "number",
             "config": {"min_val": 0, "max_val": 100}},
        ],
    })
    prepared = mc.gather_inputs([{"seconds_total": 12.0}])
    assert "seconds_maybe" in prepared


def test_multi_conditioner_pre_encoded_keys():
    mc = create_multi_conditioner_from_conditioning_config({
        "cond_dim": 8,
        "pre_encoded_keys": ["embedding"],
        "configs": [
            {"id": "embedding", "type": "number", "config": {}},
        ],
    })
    emb = np.ones((4, 8), np.float32)
    prepared = mc.gather_inputs([{"embedding": emb}])
    assert prepared["embedding"]["pre_encoded"].shape == (1, 4, 8)
    bank = mc.make_bank()
    p = jax.tree_util.tree_map(jnp.asarray, prepared)
    variables = bank.init(jax.random.PRNGKey(0), p)
    out = bank.apply(variables, p)
    assert out["embedding"][1] is None


@pytest.mark.slow
def test_ae_val_metrics():
    from stable_audio_tools_tpu.training.losses.metrics import make_eval_metrics

    m = make_eval_metrics(16000)
    a = jnp.asarray(np.random.RandomState(0).randn(1, 2, 4096).astype(np.float32))
    b = a + 0.01
    for name, fn in m.items():
        v = float(fn(b, a))
        assert np.isfinite(v), name
