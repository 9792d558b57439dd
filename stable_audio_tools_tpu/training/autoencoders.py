"""Autoencoder GAN training.

Capability parity with reference stable_audio_tools/training/autoencoders.py
(:31-538): manual two-optimizer GAN alternation on step parity (:476-515),
default EnCodec-disc + MRSTFT + L1 loss config (:91-133), sum/difference
stereo STFT + per-channel L/R STFT (:143-146,185-194), warmup modes adv/full
with encoder freeze (:394-398), bottleneck losses (kl/quantizer/codebook+
commitment/mmd, :640-671), latent masking (:410-413), EMA (:252-264),
teacher distillation 5-way losses (:171-180).

TPU design: generator and discriminator phases are two separately-jitted
programs selected on the host by step parity (the host owns the step counter,
so no wasted compute on the untaken branch); each program fuses pretransform,
losses (XLA-FFT STFTs) and the optax update.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.bottleneck import (
    DACRVQBottleneck,
    DACRVQVAEBottleneck,
    FSQBottleneck,
    RVQBottleneck,
    RVQVAEBottleneck,
    VAEBottleneck,
    WassersteinBottleneck,
)
from ..models.discriminators import (
    DACGANLoss,
    EncodecDiscriminator,
    OobleckDiscriminator,
)
from .ema import ema_update
from .losses.auraloss import MultiResolutionSTFTLoss, SumAndDifferenceSTFTLoss
from .losses.losses import (
    AuralossLoss,
    L1Loss,
    LossModule,
    MSELoss,
    MultiLoss,
    ValueLoss,
)
from .utils import build_optimizer


def create_loss_modules_from_bottleneck(bottleneck, loss_config):
    """reference training/autoencoders.py:640-671."""
    losses = []
    weights = loss_config.get("bottleneck", {}).get("weights", {})
    if isinstance(bottleneck, (VAEBottleneck, DACRVQVAEBottleneck, RVQVAEBottleneck)):
        losses.append(ValueLoss(key="kl", weight=weights.get("kl", 1e-6), name="kl_loss"))
    if isinstance(bottleneck, (RVQBottleneck, RVQVAEBottleneck)):
        losses.append(ValueLoss(key="quantizer_loss", weight=1.0, name="quantizer_loss"))
    if isinstance(bottleneck, (DACRVQBottleneck, DACRVQVAEBottleneck)):
        losses.append(
            ValueLoss(key="vq/codebook_loss", weight=weights.get("codebook", 1.0),
                      name="codebook_loss")
        )
        losses.append(
            ValueLoss(key="vq/commitment_loss", weight=weights.get("commitment", 0.25),
                      name="commitment_loss")
        )
    if isinstance(bottleneck, WassersteinBottleneck):
        losses.append(ValueLoss(key="mmd", weight=weights.get("mmd", 100), name="mmd_loss"))
    return losses


class AEGanTrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: tp.Any
    gen_opt_state: tp.Any
    disc_params: tp.Optional[tp.Any] = None
    disc_opt_state: tp.Optional[tp.Any] = None
    ema_params: tp.Optional[tp.Any] = None
    quantizer_state: tp.Optional[tp.Any] = None


class AutoencoderTrainer:
    def __init__(
        self,
        autoencoder,
        sample_rate: int = 48000,
        loss_config: tp.Optional[dict] = None,
        optimizer_configs: tp.Optional[dict] = None,
        lr: float = 1e-4,
        warmup_steps: int = 0,
        warmup_mode: str = "adv",
        encoder_freeze_on_warmup: bool = False,
        use_ema: bool = True,
        force_input_mono: bool = False,
        latent_mask_ratio: float = 0.0,
        teacher_model=None,
        teacher_variables=None,
        clip_grad_norm: float = 0.0,
        compute_dtype: tp.Optional[str] = None,
    ):
        # bf16 forward compute (losses/grads stay fp32)
        self.compute_dtype = compute_dtype
        self.autoencoder = autoencoder
        self.sample_rate = sample_rate
        self.warmup_steps = warmup_steps
        self.warmup_mode = warmup_mode
        self.encoder_freeze_on_warmup = encoder_freeze_on_warmup
        self.use_ema = use_ema
        self.force_input_mono = force_input_mono
        self.latent_mask_ratio = latent_mask_ratio
        self.teacher_model = teacher_model
        self.teacher_variables = teacher_variables
        self.clip_grad_norm = clip_grad_norm
        lr = lr if lr is not None else 1e-4

        if optimizer_configs is None:
            optimizer_configs = {
                "autoencoder": {"optimizer": {"type": "AdamW", "config": {
                    "lr": lr, "betas": (0.8, 0.99)}}},
                "discriminator": {"optimizer": {"type": "AdamW", "config": {
                    "lr": lr, "betas": (0.8, 0.99)}}},
            }
        self.optimizer_configs = optimizer_configs

        if loss_config is None:
            scales = [2048, 1024, 512, 256, 128, 64, 32]
            hop_sizes = [int(s * 0.25) for s in scales]
            win_lengths = list(scales)
            loss_config = {
                "discriminator": {
                    "type": "encodec",
                    "config": {"n_ffts": scales, "hop_lengths": hop_sizes,
                               "win_lengths": win_lengths, "filters": 32},
                    "weights": {"adversarial": 0.1, "feature_matching": 5.0},
                },
                "spectral": {
                    "type": "mrstft",
                    "config": {"fft_sizes": scales, "hop_sizes": hop_sizes,
                               "win_lengths": win_lengths,
                               "perceptual_weighting": True},
                    "weights": {"mrstft": 1.0},
                },
                "time": {"type": "l1", "config": {}, "weights": {"l1": 0.0}},
            }
        self.loss_config = loss_config
        self.use_disc = "discriminator" in loss_config

        stft_args = dict(loss_config["spectral"]["config"])
        stft_args.pop("sample_rate", None)
        fft_sizes = tuple(stft_args.pop("fft_sizes"))
        hop_sizes = tuple(stft_args.pop("hop_sizes"))
        win_lengths = tuple(stft_args.pop("win_lengths"))
        out_ch = autoencoder.out_channels or autoencoder.io_channels
        self.out_channels = out_ch
        if out_ch == 2:
            self.sdstft = SumAndDifferenceSTFTLoss(
                fft_sizes, hop_sizes, win_lengths, sample_rate=sample_rate, **stft_args
            )
            self.lrstft = MultiResolutionSTFTLoss(
                fft_sizes, hop_sizes, win_lengths, sample_rate=sample_rate, **stft_args
            )
        else:
            self.sdstft = MultiResolutionSTFTLoss(
                fft_sizes, hop_sizes, win_lengths, sample_rate=sample_rate, **stft_args
            )

        # discriminator module
        self.discriminator = None
        if self.use_disc:
            d_cfg = {k: tuple(v) if isinstance(v, list) else v
                     for k, v in loss_config["discriminator"]["config"].items()}
            # disc conv stacks follow the autoencoder's compute dtype unless
            # the config overrides: f32 convs bypass the v5e MXU (matches the
            # reference's 16-mixed autocast covering its discriminators)
            d_cfg.setdefault("compute_dtype", self.compute_dtype or "float32")
            d_type = loss_config["discriminator"]["type"]
            if d_type == "encodec":
                self.discriminator = EncodecDiscriminator(in_channels=out_ch, **d_cfg)
            elif d_type == "oobleck":
                self.discriminator = OobleckDiscriminator(in_channels=out_ch, **d_cfg)
            elif d_type == "dac":
                self.discriminator = DACGANLoss(
                    channels=out_ch, sample_rate=sample_rate, **d_cfg
                )
            elif d_type == "big_vgan":
                from ..models.discriminators import BigVGANDiscriminator

                self.discriminator = BigVGANDiscriminator(
                    channels=out_ch, sample_rate=sample_rate,
                    **{k: v for k, v in d_cfg.items()
                       if k in ("periods", "compute_dtype")},
                )
            else:
                raise ValueError(f"Unknown discriminator type {d_type}")

        # generator loss modules
        gen_losses: tp.List[LossModule] = []
        if self.use_disc:
            w = loss_config["discriminator"]["weights"]
            gen_losses += [
                ValueLoss(key="loss_adv", weight=w["adversarial"], name="loss_adv"),
                ValueLoss(key="feature_matching_distance",
                          weight=w["feature_matching"], name="feature_matching_loss"),
            ]
        stft_decay = loss_config["spectral"].get("decay", 1.0)
        mrstft_weight = loss_config["spectral"]["weights"]["mrstft"]
        if teacher_model is not None:
            w = mrstft_weight * 0.25
            gen_losses += [
                MSELoss("teacher_latents", "latents", weight=w,
                        name="latent_distill_loss", decay=stft_decay),
                AuralossLoss(self.sdstft, input_key="decoded", target_key="reals",
                             name="mrstft_loss", weight=w, decay=stft_decay),
                AuralossLoss(self.sdstft, input_key="decoded",
                             target_key="teacher_decoded",
                             name="mrstft_loss_distill", weight=w, decay=stft_decay),
                AuralossLoss(self.sdstft, input_key="own_latents_teacher_decoded",
                             target_key="reals",
                             name="mrstft_loss_own_latents_teacher", weight=w,
                             decay=stft_decay),
                AuralossLoss(self.sdstft, input_key="teacher_latents_own_decoded",
                             target_key="reals",
                             name="mrstft_loss_teacher_latents_own", weight=w,
                             decay=stft_decay),
            ]
        else:
            gen_losses.append(
                AuralossLoss(self.sdstft, input_key="decoded", target_key="reals",
                             name="mrstft_loss", weight=mrstft_weight, decay=stft_decay)
            )
            if out_ch == 2:
                gen_losses += [
                    AuralossLoss(self.lrstft, input_key="decoded_left",
                                 target_key="reals_left", name="stft_loss_left",
                                 weight=mrstft_weight / 2, decay=stft_decay),
                    AuralossLoss(self.lrstft, input_key="decoded_right",
                                 target_key="reals_right", name="stft_loss_right",
                                 weight=mrstft_weight / 2, decay=stft_decay),
                ]

        if "mrmel" in loss_config and loss_config["mrmel"]["weights"]["mrmel"] > 0:
            from .losses.semantic import MelSpectrogramLoss

            mcfg = loss_config["mrmel"]["config"]
            mrmel = MelSpectrogramLoss(
                sample_rate, n_mels=tuple(mcfg["n_mels"]),
                window_lengths=tuple(mcfg["window_lengths"]),
                pow=mcfg.get("pow", 2.0), log_weight=mcfg.get("log_weight", 1.0),
                mag_weight=mcfg.get("mag_weight", 1.0),
            )
            from .losses.losses import LossWithTarget

            gen_losses.append(LossWithTarget(
                mrmel, input_key="decoded", target_key="reals",
                name="mrmel_loss", weight=loss_config["mrmel"]["weights"]["mrmel"],
            ))

        if "hubert" in loss_config and \
                loss_config["hubert"]["weights"]["hubert"] > 0:
            from .losses.losses import LossWithTarget
            from .losses.semantic import HubertLoss

            hcfg = loss_config["hubert"].get("config", {})
            gen_losses.append(LossWithTarget(
                HubertLoss(weight=1.0, **hcfg),
                input_key="decoded", target_key="reals",
                name="hubert_loss",
                weight=loss_config["hubert"]["weights"]["hubert"],
                decay=loss_config["hubert"].get("decay", 1.0),
            ))

        tw = loss_config.get("time", {}).get("weights", {})
        tdecay = loss_config.get("time", {}).get("decay", 1.0)
        if tw.get("l1", 0.0) > 0.0:
            gen_losses.append(L1Loss("reals", "decoded", weight=tw["l1"],
                                     name="l1_time_loss", decay=tdecay))
        if tw.get("l2", 0.0) > 0.0:
            gen_losses.append(MSELoss("reals", "decoded", weight=tw["l2"],
                                      name="l2_time_loss", decay=tdecay))

        if autoencoder.bottleneck is not None:
            gen_losses += create_loss_modules_from_bottleneck(
                autoencoder.bottleneck, loss_config
            )

        self.losses_gen = MultiLoss(gen_losses)
        self.losses_disc = MultiLoss([
            ValueLoss(key="loss_dis", weight=1.0, name="discriminator_loss")
        ])

        self.gen_optimizer = build_optimizer(optimizer_configs["autoencoder"])
        if self.use_disc:
            self.disc_optimizer = build_optimizer(optimizer_configs["discriminator"])
        if clip_grad_norm > 0.0:
            self.gen_optimizer = optax.chain(
                optax.clip_by_global_norm(clip_grad_norm), self.gen_optimizer
            )
            if self.use_disc:
                self.disc_optimizer = optax.chain(
                    optax.clip_by_global_norm(clip_grad_norm), self.disc_optimizer
                )

        self._jit_cache = {}

    # -- init ---------------------------------------------------------------

    def init_state(self, rng, sample_audio) -> AEGanTrainState:
        """sample_audio: [B, C, T] template batch."""
        rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1)}
        gen_vars = jax.jit(self.autoencoder.init)(rngs, sample_audio)
        gen_params = gen_vars["params"]
        disc_params = None
        disc_opt_state = None
        if self.use_disc:
            disc_vars = jax.jit(self.discriminator.init)(
                {"params": jax.random.fold_in(rng, 2)}, sample_audio
            )
            disc_params = disc_vars["params"]
            disc_opt_state = self.disc_optimizer.init(disc_params)
        return AEGanTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            gen_opt_state=self.gen_optimizer.init(gen_params),
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
            ema_params=(jax.tree_util.tree_map(jnp.copy, gen_params)
                        if self.use_ema else None),
            quantizer_state=gen_vars.get("quantizer_state"),
        )

    # -- forward helpers ------------------------------------------------------

    def _ae_forward(self, gen_params, quantizer_state, reals, rng, train=True,
                    freeze_encoder=False):
        """Returns (decoded, loss_info, new_quantizer_state)."""
        model = self.autoencoder
        variables = {"params": gen_params}
        if quantizer_state is not None:
            variables["quantizer_state"] = quantizer_state
        rngs = {"sample": rng}
        loss_info = {"reals": reals}

        encoder_input = reals
        if self.force_input_mono and encoder_input.shape[1] > 1:
            encoder_input = encoder_input.mean(axis=1, keepdims=True)
        loss_info["encoder_input"] = encoder_input

        if self.compute_dtype is not None:
            encoder_input = encoder_input.astype(jnp.dtype(self.compute_dtype))
        mutable = ["quantizer_state"] if quantizer_state is not None and train else False
        enc_out = model.apply(
            variables, encoder_input, return_info=True, train=train,
            rngs=rngs, mutable=mutable, method=model.encode,
        )
        new_qs = quantizer_state
        if mutable:
            (latents, enc_info), updates = enc_out
            new_qs = updates.get("quantizer_state", quantizer_state)
        else:
            latents, enc_info = enc_out
        if freeze_encoder:
            latents = jax.lax.stop_gradient(latents)
            enc_info = jax.tree_util.tree_map(jax.lax.stop_gradient, enc_info)
        loss_info["latents"] = latents
        loss_info.update(enc_info)

        if self.teacher_model is not None:
            t_latents = self.teacher_model.apply(
                self.teacher_variables, encoder_input,
                rngs={"sample": jax.random.fold_in(rng, 7)},
                method=self.teacher_model.encode,
            )
            loss_info["teacher_latents"] = jax.lax.stop_gradient(t_latents)

        if self.latent_mask_ratio > 0.0 and train:
            mask = jax.random.uniform(jax.random.fold_in(rng, 3), latents.shape)
            latents = jnp.where(mask < self.latent_mask_ratio,
                                jnp.zeros_like(latents), latents)

        # quantize_on_decode bottlenecks: encode already ran the quantizer to
        # populate codes/losses; decode the quantized tensor from enc_info
        # instead of running the quantizer a second time on the same latents.
        # (Latent masking must see the unquantized latents, so fall back to
        # the quantize-in-decode path when masking is active.)
        decode_in, decode_kwargs = latents, {}
        if (model.bottleneck is not None
                and getattr(model.bottleneck, "quantize_on_decode", False)
                and "z" in enc_info
                and not (self.latent_mask_ratio > 0.0 and train)):
            from ..models.autoencoders import nlc_to_nct
            decode_in = nlc_to_nct(enc_info["z"])
            decode_kwargs = {"quantized": True}

        decoded = model.apply(
            variables, decode_in, train=train,
            rngs={"sample": jax.random.fold_in(rng, 4)}, method=model.decode,
            **decode_kwargs,
        )
        if self.compute_dtype is not None:
            # losses and GAN heads run in fp32
            decoded = decoded.astype(jnp.float32)
            latents = latents.astype(jnp.float32)
            loss_info = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if hasattr(a, "dtype") and a.dtype == jnp.dtype(self.compute_dtype)
                else a,
                loss_info,
            )
        # trim to shortest (transpose-conv length drift)
        T = min(decoded.shape[-1], reals.shape[-1])
        decoded = decoded[..., :T]
        reals_t = reals[..., :T]
        loss_info["decoded"] = decoded
        loss_info["reals"] = reals_t
        if self.out_channels == 2:
            loss_info["decoded_left"] = decoded[:, 0:1]
            loss_info["decoded_right"] = decoded[:, 1:2]
            loss_info["reals_left"] = reals_t[:, 0:1]
            loss_info["reals_right"] = reals_t[:, 1:2]

        if self.teacher_model is not None:
            tv = self.teacher_variables
            tm = self.teacher_model
            t_rngs = {"sample": jax.random.fold_in(rng, 8)}
            loss_info["teacher_decoded"] = jax.lax.stop_gradient(tm.apply(
                tv, loss_info["teacher_latents"], rngs=t_rngs, method=tm.decode))
            loss_info["own_latents_teacher_decoded"] = tm.apply(
                tv, latents, rngs=t_rngs, method=tm.decode)
            loss_info["teacher_latents_own_decoded"] = model.apply(
                variables, loss_info["teacher_latents"], rngs=t_rngs,
                method=model.decode)

        return decoded, loss_info, new_qs

    # -- steps ----------------------------------------------------------------

    def _gen_step_fn(self, warmed_up: bool):
        freeze_enc = warmed_up and self.encoder_freeze_on_warmup

        def loss_fn(gen_params, disc_params, quantizer_state, reals, rng, step):
            decoded, loss_info, new_qs = self._ae_forward(
                gen_params, quantizer_state, reals, rng, train=True,
                freeze_encoder=freeze_enc,
            )
            if self.use_disc and warmed_up:
                _, loss_adv, fm = self.discriminator.apply(
                    {"params": jax.lax.stop_gradient(disc_params)},
                    loss_info["reals"], decoded, method=self.discriminator.loss,
                )
                loss_info["loss_adv"] = loss_adv
                loss_info["feature_matching_distance"] = fm
            elif self.use_disc:
                loss_info["loss_adv"] = jnp.zeros(())
                loss_info["feature_matching_distance"] = jnp.zeros(())
            loss, losses = self.losses_gen(loss_info, step)
            aux = {"loss": loss, "latent_std": jnp.std(loss_info["latents"]),
                   "data_std": jnp.std(reals), **losses}
            return loss, (aux, new_qs)

        def gen_step(state: AEGanTrainState, reals, rng):
            (loss, (aux, new_qs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.gen_params, state.disc_params, state.quantizer_state,
              reals, rng, state.step)
            updates, new_opt = self.gen_optimizer.update(
                grads, state.gen_opt_state, state.gen_params
            )
            new_params = optax.apply_updates(state.gen_params, updates)
            new_ema = state.ema_params
            if new_ema is not None:
                new_ema = ema_update(new_ema, new_params, state.step)
            return state.replace(
                step=state.step + 1, gen_params=new_params, gen_opt_state=new_opt,
                ema_params=new_ema, quantizer_state=new_qs,
            ), aux

        return gen_step

    def _disc_step_fn(self, warmed_up: bool):
        def loss_fn(disc_params, gen_params, quantizer_state, reals, rng, step):
            decoded, loss_info, _ = self._ae_forward(
                jax.lax.stop_gradient(gen_params), quantizer_state, reals, rng,
                train=True,
            )
            decoded = jax.lax.stop_gradient(decoded)
            loss_dis, _, _ = self.discriminator.apply(
                {"params": disc_params}, loss_info["reals"], decoded,
                method=self.discriminator.loss,
            )
            loss_info["loss_dis"] = loss_dis
            loss, losses = self.losses_disc(loss_info, step)
            return loss, {"loss_dis": loss_dis, **losses}

        def disc_step(state: AEGanTrainState, reals, rng):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.disc_params, state.gen_params, state.quantizer_state,
                reals, rng, state.step,
            )
            updates, new_opt = self.disc_optimizer.update(
                grads, state.disc_opt_state, state.disc_params
            )
            new_params = optax.apply_updates(state.disc_params, updates)
            return state.replace(
                step=state.step + 1, disc_params=new_params, disc_opt_state=new_opt,
            ), aux

        return disc_step

    def train_step(self, state: AEGanTrainState, batch, rng, step: int):
        """Host-dispatched GAN alternation (reference :476-515): odd steps train
        the discriminator (post-warmup per warmup_mode), even steps the
        generator. `step` is the host-side counter."""
        warmed_up = step >= self.warmup_steps
        use_disc_now = (
            self.use_disc
            and step % 2 == 1
            and ((self.warmup_mode == "full" and warmed_up)
                 or self.warmup_mode == "adv")
        )
        key = ("disc" if use_disc_now else "gen", warmed_up)
        if key not in self._jit_cache:
            fn = (self._disc_step_fn(warmed_up) if use_disc_now
                  else self._gen_step_fn(warmed_up))
            # donate the state: without it XLA copies every param/moment/EMA
            # buffer it updates in place (~68 ms/pair at SA-2.0 scale)
            self._jit_cache[key] = jax.jit(fn, donate_argnums=(0,))
        return self._jit_cache[key](state, batch, rng)

    def make_val_step(self, eval_loss_config: tp.Optional[dict] = None):
        """Validation metrics (reference :268-365): STFT / SI-SDR / mel."""
        from .losses.metrics import make_eval_metrics

        metrics = make_eval_metrics(self.sample_rate, eval_loss_config)

        def val_step(state: AEGanTrainState, reals, rng):
            decoded, loss_info, _ = self._ae_forward(
                state.gen_params, state.quantizer_state, reals, rng, train=False
            )
            out = {}
            for name, fn in metrics.items():
                out[f"val/{name}"] = fn(loss_info["decoded"], loss_info["reals"])
            return out

        return val_step

    def export_params(self, state: AEGanTrainState):
        """EMA-swapped export params (reference export_model :529-538)."""
        return state.ema_params if state.ema_params is not None else state.gen_params
