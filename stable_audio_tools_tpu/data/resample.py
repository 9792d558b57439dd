"""Host-side polyphase resampling (torchaudio.transforms.Resample equivalent).

scipy-based; used by the data pipeline and audio prep. A jnp variant
(resample_poly_jnp) covers on-device resampling needs.
"""

from __future__ import annotations

import math

import numpy as np
from scipy import signal as sps


from functools import lru_cache


@lru_cache(maxsize=16)
def _design_taps(up: int, down: int) -> np.ndarray:
    max_rate = max(up, down)
    half_len = 10 * max_rate
    return sps.firwin(2 * half_len + 1, 1.0 / max_rate,
                      window=("kaiser", 5.0)).astype(np.float32)


def resample_poly_np(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """1-D polyphase resample; native C++ kernel when built, scipy fallback."""
    if orig_sr == target_sr:
        return np.asarray(x, np.float32)
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    from .native import available, resample_poly_native

    if available():
        return resample_poly_native(np.asarray(x, np.float32), up, down,
                                    _design_taps(up, down))
    return sps.resample_poly(np.asarray(x, np.float64), up, down).astype(np.float32)
