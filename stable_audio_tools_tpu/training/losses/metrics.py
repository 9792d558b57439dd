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
    """Returns {name: loss_fn(decoded, reals)} per the eval loss config."""
    cfg = eval_loss_config or {"stft": {}, "sisdr": {}, "mel": {}}
    metrics = {}
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
    """Host-side PESQ (reference losses/metrics.py:9); requires `pesq`."""

    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate
        try:
            from pesq import pesq  # noqa: F401

            self._available = True
        except ImportError:
            self._available = False

    def __call__(self, decoded: np.ndarray, reals: np.ndarray) -> float:
        if not self._available:
            return float("nan")
        from pesq import pesq

        from ...data.resample import resample_poly_np

        scores = []
        for b in range(decoded.shape[0]):
            d = np.asarray(decoded[b]).mean(0)
            r = np.asarray(reals[b]).mean(0)
            if self.sample_rate != 16000:
                d = resample_poly_np(d, self.sample_rate, 16000)
                r = resample_poly_np(r, self.sample_rate, 16000)
            scores.append(pesq(16000, r, d, "wb"))
        return float(np.mean(scores))
