"""Random inpainting masks (reference stable_audio_tools/models/inpainting.py).

JIT-safe redesign of the reference's per-item python loop: mask types and
segment geometry are drawn with jax.random inside the traced program, using a
fixed number of candidate segments with length/position clipping — same mask
distribution family {RANDOM_SEGMENTS, FULL_MASK, CAUSAL_MASK} honoring
padding masks, but expressible as one fused program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

MASK_RANDOM_SEGMENTS = 0
MASK_FULL = 1
MASK_CAUSAL = 2


def random_inpaint_mask(
    sequence: jax.Array,
    rng: jax.Array,
    padding_masks: Optional[jax.Array] = None,
    max_mask_segments: int = 10,
    mask_type_probabilities: Optional[Sequence[float]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """sequence: [B, C, T]; padding_masks: [B, T] (1 = real data).

    Returns (masked_sequence, inpaint_mask [B, 1, T]); mask 0 = inpaint.
    """
    B, _, T = sequence.shape
    if mask_type_probabilities is None:
        mask_type_probabilities = [0.1, 0.8, 0.1]
    probs = jnp.asarray(mask_type_probabilities)
    if padding_masks is None:
        padding_masks = jnp.ones((B, T))
    real_len = jnp.sum(padding_masks.astype(jnp.int32), axis=1)  # [B]

    r_type, r_nseg, r_seg, r_causal = jax.random.split(rng, 4)
    mask_type = jax.random.choice(r_type, 3, (B,), p=probs)

    pos = jnp.arange(T)[None, :]  # [1, T]

    # RANDOM_SEGMENTS: draw max_mask_segments candidates; segment k active
    # iff k < num_segments. Each segment has random start/length within the
    # real region.
    num_segments = jax.random.randint(r_nseg, (B,), 1, max_mask_segments + 1)
    seg_keys = jax.random.split(r_seg, 2)
    max_len = jnp.maximum(real_len[:, None] // jnp.maximum(num_segments[:, None], 1), 1)
    seg_len = jax.random.randint(
        seg_keys[0], (B, max_mask_segments), 1, jnp.iinfo(jnp.int32).max
    ) % max_len + 1  # in [1, max_len]
    seg_start_max = jnp.maximum(real_len[:, None] - seg_len, 0)
    seg_start = jax.random.randint(
        seg_keys[1], (B, max_mask_segments), 0, jnp.iinfo(jnp.int32).max
    ) % jnp.maximum(seg_start_max + 1, 1)
    k_active = (
        jnp.arange(max_mask_segments)[None, :] < num_segments[:, None]
    )  # [B, K]
    # in-segment indicator per position: [B, K, T]
    in_seg = (
        (pos[:, None, :] >= seg_start[:, :, None])
        & (pos[:, None, :] < (seg_start + seg_len)[:, :, None])
        & k_active[:, :, None]
    )
    segments_mask = 1.0 - jnp.any(in_seg, axis=1).astype(jnp.float32)  # [B, T]

    # CAUSAL: keep random prefix of real region, inpaint the rest of it
    prefix = jax.random.randint(
        r_causal, (B,), 0, jnp.iinfo(jnp.int32).max
    ) % jnp.maximum(real_len + 1, 1)
    causal_mask = jnp.where(
        (pos >= prefix[:, None]) & (pos < real_len[:, None]), 0.0, 1.0
    )

    full_mask = jnp.zeros((B, T))
    ones = jnp.ones((B, T))

    # empty real region → all-ones for segments/causal (reference behavior)
    segments_mask = jnp.where(real_len[:, None] == 0, ones, segments_mask)
    causal_mask = jnp.where(real_len[:, None] == 0, ones, causal_mask)

    mask = jnp.where(
        (mask_type == MASK_FULL)[:, None], full_mask,
        jnp.where((mask_type == MASK_CAUSAL)[:, None], causal_mask, segments_mask),
    )[:, None, :]  # [B, 1, T]

    return sequence * mask.astype(sequence.dtype), mask.astype(sequence.dtype)
