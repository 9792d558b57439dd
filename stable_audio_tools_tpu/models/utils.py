"""Model utilities: token sampling + checkpoint helpers.

Capability parity with reference stable_audio_tools/models/utils.py:
multinomial/sample_top_k/sample_top_p (:63-121); checkpoint loading lives in
io/checkpoints.py (load_ckpt_state_dict/copy_state_dict re-exported here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..io.checkpoints import copy_state_dict, load_ckpt_state_dict  # noqa: F401


def multinomial(probs: jax.Array, num_samples: int, rng) -> jax.Array:
    """Sample indices from probs along the last axis. [..., card] → [..., n]."""
    logits = jnp.log(jnp.clip(probs, 1e-12, None))
    flat = logits.reshape(-1, logits.shape[-1])
    keys = jax.random.split(rng, flat.shape[0])
    samples = jax.vmap(
        lambda k, l: jax.random.categorical(k, l, shape=(num_samples,))
    )(keys, flat)
    return samples.reshape(probs.shape[:-1] + (num_samples,))


def sample_top_k(probs: jax.Array, k: int, rng) -> jax.Array:
    """Top-k sampling (reference :78-94).

    Threshold formulation: mask everything below the k-th largest prob to
    -inf and sample categorically — same distribution as gather+renormalize
    (ties at the threshold may admit a few extra candidates), but avoids the
    take_along_axis gather, which measurably matters inside AR decode scans.
    """
    thresh = jax.lax.top_k(probs, k)[0][..., -1:]
    logits = jnp.where(
        probs >= thresh, jnp.log(jnp.clip(probs, 1e-12, None)), -jnp.inf
    )
    return jax.random.categorical(rng, logits, axis=-1)[..., None]


def sample_top_p(probs: jax.Array, p: float, rng) -> jax.Array:
    """Nucleus sampling (reference :96-115)."""
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    sorted_idx = jnp.argsort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    mask = (cum - sorted_probs) > p
    sorted_probs = jnp.where(mask, 0.0, sorted_probs)
    sorted_probs = sorted_probs / jnp.sum(sorted_probs, axis=-1, keepdims=True)
    sampled = multinomial(sorted_probs, 1, rng)
    return jnp.take_along_axis(sorted_idx, sampled, axis=-1)
