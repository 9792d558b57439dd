"""Host-side polyphase resampling (torchaudio.transforms.Resample equivalent).

scipy-based; used by the data pipeline and audio prep. A jnp variant
(resample_poly_jnp) covers on-device resampling needs.
"""

from __future__ import annotations

import math

import numpy as np
from scipy import signal as sps


def resample_poly_np(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """1-D polyphase resample, numpy."""
    if orig_sr == target_sr:
        return np.asarray(x, np.float32)
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    return sps.resample_poly(np.asarray(x, np.float64), up, down).astype(np.float32)
