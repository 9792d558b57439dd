"""LM training (reference stable_audio_tools/training/lm.py:20-264).

Tokenize via the discrete pretransform, pattern-shifted logits, per-codebook
cross-entropy with pattern masks, perplexity logging; one jitted train step.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import optax

from .diffusion import TrainState
from .ema import ema_update
from .utils import build_optimizer


class AudioLanguageModelTrainer:
    def __init__(self, model, lr: tp.Optional[float] = None, use_ema: bool = False,
                 optimizer_configs: tp.Optional[dict] = None,
                 pre_tokenized: bool = False):
        self.model = model
        self.use_ema = use_ema
        self.pre_tokenized = pre_tokenized
        assert lr is not None or optimizer_configs is not None
        if optimizer_configs is None:
            optimizer_configs = {
                "lm": {"optimizer": {"type": "AdamW", "config": {
                    "lr": lr, "betas": (0.9, 0.95), "weight_decay": 0.1}}}
            }
        self.optimizer_configs = optimizer_configs
        self.optimizer = build_optimizer(optimizer_configs["lm"])

    def init_state(self, variables) -> TrainState:
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if self.use_ema else None,
            quantizer_state=variables.get("quantizer_state"),
        )

    def _loss(self, params, batch, rng, quantizer_state=None):
        model = self.model
        variables = {"params": params}
        if quantizer_state is not None:
            # RVQ codecs (encodec/audiocraft pretransforms) keep their
            # codebooks in this collection; tokenize needs it
            variables["quantizer_state"] = quantizer_state
        rngs = {"sample": rng}
        if self.pre_tokenized:
            codes = batch["codes"]  # [B, K, T]
        else:
            tokens = model.apply(
                variables, batch["audio"], rngs=rngs,
                method=model.pretransform_tokenize,
            )  # [B, T, Q] (bottleneck layout) or [B, Q, T]
            if tokens.shape[1] != model.num_quantizers:
                tokens = jnp.transpose(tokens, (0, 2, 1))
            codes = jax.lax.stop_gradient(tokens.astype(jnp.int32))

        logits, mask = model.apply(
            variables, codes, cond_tensors=batch.get("cond_tensors"),
            cond=batch.get("prepared_cond"),
            rngs=rngs, method=model.compute_logits,
        )  # [B, K, T, card], [B, K, T]
        # next-token CE: logits at position t predict token t+1 within each
        # codebook stream (the pattern shift already aligned positions)
        targets = codes[:, :, 1:]
        pred = logits[:, :, :-1, :]
        m = mask[:, :, 1:]
        logp = jax.nn.log_softmax(pred, axis=-1)
        ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        ce = jnp.sum(ce * m) / jnp.clip(jnp.sum(m), 1, None)
        per_cb = jnp.sum(
            -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0] * m,
            axis=(0, 2),
        ) / jnp.clip(jnp.sum(m, axis=(0, 2)), 1, None)
        aux = {"loss": ce, "perplexity": jnp.exp(ce)}
        for i in range(per_cb.shape[0]):
            aux[f"ce_q{i}"] = per_cb[i]
        return ce, aux

    def make_train_step(self, accum_steps: int = 1):
        def train_step(state: TrainState, batch, rng):
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.params, batch, rng, state.quantizer_state
            )
            updates, new_opt = self.optimizer.update(grads, state.opt_state,
                                                     state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if new_ema is not None:
                new_ema = ema_update(new_ema, new_params, state.step)
            return state.replace(step=state.step + 1, params=new_params,
                                 opt_state=new_opt, ema_params=new_ema), aux

        return train_step
