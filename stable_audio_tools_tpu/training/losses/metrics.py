"""Evaluation metrics for autoencoder validation.

Reference eval losses (training/autoencoders.py:268-279): PESQ / STFT /
SI-SDR / mel distances. PESQ requires the `pesq` package (host-side, gated);
the rest run on-device via the jnp loss implementations.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

from .auraloss import MelSTFTLoss, MultiResolutionSTFTLoss, SISDRLoss


def make_eval_metrics(sample_rate: int, eval_loss_config: tp.Optional[dict] = None):
    """Returns {name: loss_fn(decoded, reals)} per the eval loss config
    (reference training/autoencoders.py:268-279: pesq/stft/sisdr/mel)."""
    cfg = eval_loss_config or {"stft": {}, "sisdr": {}, "mel": {}}
    metrics = {}
    if "pesq" in cfg:
        pm = PESQMetric(sample_rate)
        # host-side metric: pull the device arrays and score in numpy
        metrics["pesq"] = lambda d, r: pm(np.asarray(d), np.asarray(r))
    if "stft" in cfg:
        metrics["stft"] = MultiResolutionSTFTLoss(
            fft_sizes=(2048, 1024, 512), hop_sizes=(512, 256, 128),
            win_lengths=(2048, 1024, 512), sample_rate=sample_rate,
        )
    if "sisdr" in cfg:
        metrics["sisdr"] = SISDRLoss()
    if "mel" in cfg:
        metrics["mel"] = MelSTFTLoss(sample_rate)
    return metrics


class PESQMetric:
    """Host-side wideband PESQ (reference losses/metrics.py:9).

    Uses the conformance-tested `pesq` pip package when importable;
    otherwise falls back to the in-repo P.862 implementation
    (losses/pesq.py — structure-faithful, not bit-conformant; see its
    module docstring). `backend` says which one is active."""

    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate
        try:
            from pesq import pesq  # noqa: F401

            self.backend = "pesq-itu"
        except ImportError:
            self.backend = "in-repo-p862"

    def __repr__(self):
        return f"PESQMetric(sample_rate={self.sample_rate}, backend={self.backend})"

    def _score(self, ref16: np.ndarray, deg16: np.ndarray) -> float:
        if self.backend == "pesq-itu":
            from pesq import pesq

            return pesq(16000, ref16, deg16, "wb")
        from .pesq import pesq_wb_np

        # AE validation compares time-aligned output to input: skip the
        # crude-align search (a no-op that costs a full cross-correlation)
        return pesq_wb_np(ref16, deg16, 16000, align=False)

    def __call__(self, decoded: np.ndarray, reals: np.ndarray) -> float:
        from ...data.resample import resample_poly_np

        scores = []
        for b in range(decoded.shape[0]):
            d = np.asarray(decoded[b]).mean(0)
            r = np.asarray(reals[b]).mean(0)
            if self.sample_rate != 16000:
                d = resample_poly_np(d, self.sample_rate, 16000)
                r = resample_poly_np(r, self.sample_rate, 16000)
            scores.append(self._score(r, d))
        return float(np.mean(scores))
