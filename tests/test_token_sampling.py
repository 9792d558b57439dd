"""Token sampling utilities (reference models/utils.py:63-121 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_audio_tools_tpu.models.utils import (
    multinomial,
    sample_top_k,
    sample_top_p,
)


def _probs(card=64, batch=(2, 3), seed=0, temp=1.0):
    rs = np.random.RandomState(seed)
    logits = rs.randn(*batch, card).astype(np.float32) / temp
    p = np.exp(logits - logits.max(-1, keepdims=True))
    return jnp.asarray(p / p.sum(-1, keepdims=True))


def test_sample_top_k_stays_in_top_k():
    probs = _probs(temp=0.5)
    k = 5
    top_idx = np.asarray(jax.lax.top_k(probs, k)[1])
    for seed in range(20):
        s = np.asarray(sample_top_k(probs, k, jax.random.PRNGKey(seed)))
        assert s.shape == probs.shape[:-1] + (1,)
        for b in range(probs.shape[0]):
            for r in range(probs.shape[1]):
                assert s[b, r, 0] in top_idx[b, r]


def test_sample_top_k_matches_renormalized_distribution():
    """Empirical frequencies ≈ top-k renormalized probs."""
    probs = _probs(card=8, batch=(1, 1), seed=3)
    k = 3
    top_p_vals, top_idx = jax.lax.top_k(probs, k)
    expected = np.zeros(8)
    expected[np.asarray(top_idx)[0, 0]] = np.asarray(
        top_p_vals / top_p_vals.sum(-1, keepdims=True)
    )[0, 0]
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draws = jax.vmap(lambda key: sample_top_k(probs, k, key))(keys)
    counts = np.bincount(np.asarray(draws).ravel(), minlength=8) / n
    np.testing.assert_allclose(counts, expected, atol=0.05)


def test_sample_top_p_mass_bound():
    probs = _probs(temp=0.3)
    for seed in range(10):
        s = np.asarray(sample_top_p(probs, 0.5, jax.random.PRNGKey(seed)))
        # every drawn token must be inside the smallest prefix covering p
        sorted_idx = np.asarray(jnp.argsort(probs, axis=-1)[..., ::-1])
        sorted_p = np.sort(np.asarray(probs), axis=-1)[..., ::-1]
        cum = np.cumsum(sorted_p, -1)
        for b in range(probs.shape[0]):
            for r in range(probs.shape[1]):
                n_keep = int((cum[b, r] - sorted_p[b, r] <= 0.5).sum())
                assert s[b, r, 0] in sorted_idx[b, r, :n_keep]


def test_multinomial_shapes_and_support():
    probs = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])
    s = multinomial(probs, 4, jax.random.PRNGKey(0))
    assert s.shape == (1, 4)
    assert np.all(np.asarray(s) == 1)
