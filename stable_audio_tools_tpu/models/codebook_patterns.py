"""Multi-codebook interleaving patterns for token LMs.

Capability parity with reference stable_audio_tools/models/codebook_patterns.py
(audiocraft's Pattern machinery): build_pattern_sequence /
revert_pattern_sequence / revert_pattern_logits plus the provider family
{Delayed, Parallel, Unrolled, CoarseFirst, MusicLM}.

TPU redesign: a pattern is a static numpy index map [K, S] (t or -1 for the
special token), so build/revert compile to one gather each — the reference's
lru-cached scatter-index builders become trace-time constants.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


class Pattern:
    """Static interleave pattern.

    index_map: [K, S] int array; entry t>=0 reads codes[:, k, t], -1 reads the
    special token. Valid patterns reference each (k, t) at most once.
    """

    def __init__(self, index_map: np.ndarray, timesteps: int):
        self.index_map = np.asarray(index_map, np.int64)
        self.K, self.S = self.index_map.shape
        self.T = timesteps
        # reverse map: for each (k, t) the pattern step s (or -1 if absent)
        rev = np.full((self.K, self.T), -1, np.int64)
        for k in range(self.K):
            for s in range(self.S):
                t = self.index_map[k, s]
                if 0 <= t < self.T:
                    rev[k, t] = s
        self.reverse_map = rev

    @property
    def max_delay(self):
        return self.S - self.T

    def valid_layout_steps(self) -> np.ndarray:
        """[S] bool: pattern steps where every codebook reads a real token."""
        return (self.index_map >= 0).all(axis=0)

    def build_pattern_sequence(self, codes: jax.Array, special_token: int):
        """codes: [B, K, T] → (seq [B, K, S], indexes [K, S], mask [K, S])."""
        B = codes.shape[0]
        idx = jnp.asarray(self.index_map)  # [K, S]
        mask = idx >= 0
        gather_idx = jnp.clip(idx, 0, self.T - 1)
        seq = jnp.take_along_axis(
            codes, jnp.broadcast_to(gather_idx[None], (B, self.K, self.S)), axis=2
        )
        seq = jnp.where(mask[None], seq, special_token)
        return seq, idx, mask

    def revert_pattern_sequence(self, seq: jax.Array, special_token: int):
        """seq: [B, K, S] → (codes [B, K, T], indexes, mask)."""
        B = seq.shape[0]
        rev = jnp.asarray(self.reverse_map)  # [K, T]
        mask = rev >= 0
        gather_idx = jnp.clip(rev, 0, self.S - 1)
        codes = jnp.take_along_axis(
            seq, jnp.broadcast_to(gather_idx[None], (B, self.K, self.T)), axis=2
        )
        codes = jnp.where(mask[None], codes, special_token)
        return codes, rev, mask

    def revert_pattern_logits(self, logits: jax.Array, special_value: float = 0.0):
        """logits: [B, card, K, S] → [B, card, K, T]."""
        B, card = logits.shape[:2]
        rev = jnp.asarray(self.reverse_map)
        mask = rev >= 0
        gather_idx = jnp.clip(rev, 0, self.S - 1)
        out = jnp.take_along_axis(
            logits,
            jnp.broadcast_to(gather_idx[None, None], (B, card, self.K, self.T)),
            axis=3,
        )
        return jnp.where(mask[None, None], out, special_value)


class CodebooksPatternProvider:
    def __init__(self, n_q: int):
        self.n_q = n_q
        self._cache: tp.Dict[int, Pattern] = {}

    def get_pattern(self, timesteps: int) -> Pattern:
        if timesteps not in self._cache:
            self._cache[timesteps] = self._build(timesteps)
        return self._cache[timesteps]

    def _build(self, timesteps: int) -> Pattern:
        raise NotImplementedError


class DelayedPatternProvider(CodebooksPatternProvider):
    """Per-codebook delays, default [0, 1, ..., K-1] (MusicGen 'delay')."""

    def __init__(self, n_q: int, delays: tp.Optional[tp.Sequence[int]] = None,
                 flatten_first: int = 0, empty_initial: int = 0):
        super().__init__(n_q)
        self.delays = list(delays) if delays is not None else list(range(n_q))
        assert len(self.delays) == n_q
        self.empty_initial = empty_initial

    def _build(self, T: int) -> Pattern:
        max_delay = max(self.delays)
        S = T + max_delay + self.empty_initial
        idx = np.full((self.n_q, S), -1, np.int64)
        for q, d in enumerate(self.delays):
            for s in range(S):
                t = s - d - self.empty_initial
                if 0 <= t < T:
                    idx[q, s] = t
        return Pattern(idx, T)


class ParallelPatternProvider(DelayedPatternProvider):
    def __init__(self, n_q: int):
        super().__init__(n_q, delays=[0] * n_q)


class UnrolledPatternProvider(CodebooksPatternProvider):
    """One codebook per step: S = T*K (audiocraft 'unroll' flattening)."""

    def __init__(self, n_q: int, flattening: tp.Optional[tp.Sequence[int]] = None,
                 delays: tp.Optional[tp.Sequence[int]] = None):
        super().__init__(n_q)
        self.flattening = list(flattening) if flattening is not None else list(range(n_q))
        self.delays = list(delays) if delays is not None else [0] * n_q

    def _build(self, T: int) -> Pattern:
        n_steps_per_t = max(self.flattening) + 1
        S = T * n_steps_per_t + max(self.delays)
        idx = np.full((self.n_q, S), -1, np.int64)
        for t in range(T):
            for q in range(self.n_q):
                s = t * n_steps_per_t + self.flattening[q] + self.delays[q]
                if s < S:
                    idx[q, s] = t
        return Pattern(idx, T)


class CoarseFirstPattern(CodebooksPatternProvider):
    """All coarse (q=0) tokens first, then the rest with delays."""

    def __init__(self, n_q: int, delays: tp.Optional[tp.Sequence[int]] = None):
        super().__init__(n_q)
        self.delays = list(delays) if delays is not None else [0] * (n_q - 1)

    def _build(self, T: int) -> Pattern:
        max_delay = max(self.delays) if self.delays else 0
        S = T + T + max_delay
        idx = np.full((self.n_q, S), -1, np.int64)
        for t in range(T):
            idx[0, t] = t
        for qi, d in enumerate(self.delays):
            q = qi + 1
            for t in range(T):
                s = T + t + d
                if s < S:
                    idx[q, s] = t
        return Pattern(idx, T)


class MusicLMPattern(CodebooksPatternProvider):
    """Grouped flattening: groups of codebooks emitted sequentially."""

    def __init__(self, n_q: int, group_by: int = 2):
        super().__init__(n_q)
        self.group_by = group_by

    def _build(self, T: int) -> Pattern:
        n_groups = self.n_q // self.group_by
        S = T * n_groups
        idx = np.full((self.n_q, S), -1, np.int64)
        for t in range(T):
            for q in range(self.n_q):
                g = q // self.group_by
                s = t * n_groups + g
                idx[q, s] = t
        return Pattern(idx, T)


def pattern_provider_from_config(config: tp.Dict[str, tp.Any], n_q: int):
    p_type = config.get("type", "delay")
    cfg = config.get("config", {})
    if p_type in ("delay", "delayed"):
        return DelayedPatternProvider(n_q, **cfg)
    if p_type == "parallel":
        return ParallelPatternProvider(n_q)
    if p_type == "unroll":
        return UnrolledPatternProvider(n_q, **cfg)
    if p_type == "coarse_first":
        return CoarseFirstPattern(n_q, **cfg)
    if p_type == "musiclm":
        return MusicLMPattern(n_q, **cfg)
    raise ValueError(f"Unknown pattern type {p_type}")
