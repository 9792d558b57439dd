"""EMA of model params as a pure pytree transform.

Rebuild target (SURVEY.md §2.9 ema-pytorch): beta=0.9999 with power-law decay
warmup — decay(step) = min(beta, 1 - (1 + step/inv_gamma)^-power) — matching
ema-pytorch defaults used by the reference training wrappers
(training/diffusion.py:240-247: beta=0.9999, power=3/4, update_every=1,
update_after_step=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(step, beta=0.9999, inv_gamma=1.0, power=0.75, update_after_step=1):
    epoch = jnp.clip(step - update_after_step - 1, 0, None).astype(jnp.float32)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** -power
    value = jnp.where(epoch <= 0, 0.0, value)
    return jnp.clip(value, 0.0, beta)


def ema_update(ema_params, new_params, step, beta=0.9999, power=0.75,
               inv_gamma=1.0, update_after_step=1):
    """One EMA step: ema = d*ema + (1-d)*new."""
    d = ema_decay(step, beta=beta, inv_gamma=inv_gamma, power=power,
                  update_after_step=update_after_step)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, new_params
    )
