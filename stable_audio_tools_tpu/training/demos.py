"""Demo callbacks: periodic inference renders during training.

Capability parity with reference create_demo_callback_from_config
(training/factory.py:171-245) and the per-family demo callbacks
(training/diffusion.py:155-212/599-796, training/autoencoders.py:540-638,
training/lm.py:182-264): render audio + mel spectrograms + latent PCA from
the EMA weights and write them to disk / the logger (rank-zero only).
"""

from __future__ import annotations

import os
import typing as tp

import numpy as np


def create_demo_callback_from_config(model_config: dict, demo_dir: str = "demos",
                                     demo_dl=None, logger=None):
    model_type = model_config["model_type"]
    training_config = model_config.get("training", {})
    demo_config = training_config.get("demo", {})

    if model_type == "diffusion_cond_inpaint":
        return DiffusionCondInpaintDemoCallback(model_config, demo_dir,
                                                demo_config, demo_dl, logger)
    if model_type == "diffusion_cond":
        return DiffusionCondDemoCallback(model_config, demo_dir, demo_config, logger)
    if model_type == "diffusion_uncond":
        return DiffusionUncondDemoCallback(model_config, demo_dir, demo_config, logger)
    if model_type == "diffusion_autoencoder":
        return DiffusionAutoencoderDemoCallback(model_config, demo_dir,
                                                demo_config, demo_dl, logger)
    if model_type == "autoencoder":
        return AutoencoderDemoCallback(model_config, demo_dir, demo_config,
                                       demo_dl, logger)
    if model_type == "lm":
        return LMDemoCallback(model_config, demo_dir, demo_config, logger)
    return None


class _DemoBase:
    def __init__(self, model_config, demo_dir, demo_config, logger=None):
        self.model_config = model_config
        self.demo_dir = demo_dir
        self.demo_config = demo_config
        self.logger = logger
        self.sample_rate = model_config["sample_rate"]
        self.sample_size = demo_config.get(
            "demo_sample_size", model_config["sample_size"]
        )

    def _save(self, audio: np.ndarray, name: str, step: int,
              latents: tp.Optional[np.ndarray] = None, caption: str = None):
        """Write wavs + mel (+ latent melspec/PCA) to demo_dir AND the logger
        (wandb shim / JSONL) — reference training/diffusion.py:599-796 logs
        a demo grid with per-cfg-scale audio, spectrogram, and latent PCA."""
        from ..data.wav import save_wav
        from ..interface.aeiou import audio_spectrogram_image

        os.makedirs(self.demo_dir, exist_ok=True)
        audio = np.asarray(audio)
        peak = np.abs(audio).max() or 1.0
        paths = []
        for b in range(audio.shape[0]):
            path = os.path.join(self.demo_dir, f"{name}_step{step}_{b}.wav")
            save_wav(path, audio[b] / peak * 0.95, self.sample_rate)
            paths.append(path)
        if self.logger is not None:
            from .utils import log_audio, log_metric

            log_audio(self.logger, f"demo/{name}", audio[0] / peak * 0.95,
                      self.sample_rate, caption=caption or name, step=step)
            log_metric(self.logger, f"demo/{name}_files", paths, step=step)
        try:
            import matplotlib

            matplotlib.use("Agg")
            img = audio_spectrogram_image(audio[0], self.sample_rate)
            from matplotlib import pyplot as plt

            plt.imsave(os.path.join(
                self.demo_dir, f"{name}_step{step}_mel.png"), img)
            if self.logger is not None:
                from .utils import log_image

                log_image(self.logger, f"demo/{name}_melspec", img, step=step)
            if latents is not None:
                from ..interface.aeiou import (
                    pca_point_cloud, tokens_spectrogram_image,
                )

                lat = np.asarray(latents)
                mel = tokens_spectrogram_image(lat)
                pca = pca_point_cloud(lat)
                plt.imsave(os.path.join(
                    self.demo_dir, f"{name}_step{step}_latents.png"), mel)
                plt.imsave(os.path.join(
                    self.demo_dir, f"{name}_step{step}_latents_pca.png"), pca)
                if self.logger is not None:
                    from .utils import log_image

                    log_image(self.logger, f"demo/{name}_latents_melspec", mel,
                              step=step)
                    log_image(self.logger, f"demo/{name}_latents_pca", pca,
                              step=step)
        except Exception:
            pass


class DiffusionCondDemoCallback(_DemoBase):
    """Demo grid over cfg scales: per-scale audio + mel + latent melspec/PCA
    to disk and the logger (reference training/diffusion.py:599-796)."""

    def __call__(self, model, wrapper, state, step: int):
        import jax

        from ..inference.generation import generate_diffusion_cond

        prompts = self.demo_config.get("demo_cond", [
            {"prompt": "demo", "seconds_start": 0, "seconds_total": 10},
        ])
        cfg_scales = self.demo_config.get("demo_cfg_scales", [6.0])
        steps = self.demo_config.get("demo_steps", 50)
        variables = {"params": state.ema_params if state.ema_params is not None
                     else state.params}
        for scale in cfg_scales:
            latents = generate_diffusion_cond(
                model, variables, steps=steps, cfg_scale=scale,
                conditioning=list(prompts), batch_size=len(prompts),
                sample_size=self.sample_size, seed=step,
                return_latents=model.pretransform is not None,
            )
            if model.pretransform is not None:
                # jit-cached: an eager codec decode pays per-op dispatch
                # (~23 ms RPC each on remote TPU backends)
                if not hasattr(self, "_decode_jit"):
                    self._decode_jit = jax.jit(
                        lambda v, z, rng: model.apply(
                            v, z, method=model.pretransform_decode,
                            rngs={"sample": rng},
                        )
                    )
                audio = self._decode_jit(variables, latents,
                                         jax.random.PRNGKey(step))
            else:
                audio, latents = latents, None
            caption = "; ".join(str(p.get("prompt", p)) for p in prompts)
            self._save(np.asarray(audio), f"demo_cfg{scale}", step,
                       latents=None if latents is None else np.asarray(latents),
                       caption=f"cfg={scale} | {caption}")


class DiffusionCondInpaintDemoCallback(_DemoBase):
    """Masked-reconstruction demo grid (reference training/diffusion.py:
    798-911): take reals from the demo dataloader, mask a segment, save the
    masked input, and render inpainted audio at each cfg scale."""

    def __init__(self, model_config, demo_dir, demo_config, demo_dl, logger=None):
        super().__init__(model_config, demo_dir, demo_config, logger)
        self.demo_dl = demo_dl

    def __call__(self, model, wrapper, state, step: int):
        import jax.numpy as jnp

        from ..inference.generation import generate_diffusion_cond_inpaint

        if self.demo_dl is None:
            return
        num_demos = self.demo_config.get("num_demos", 2)
        audio, metadata = next(iter(self.demo_dl))
        audio = np.asarray(audio)[:num_demos]
        metadata = list(metadata)[:num_demos]
        T = min(audio.shape[-1], self.sample_size)
        audio = audio[..., :T]
        self._save(audio, "inpaint_reals", step)

        # default: mask the middle half with soft edges (reference demo uses
        # random_inpaint_mask; the UI/mask_args schema is the public surface)
        mask_args = self.demo_config.get("demo_mask_args", {
            "maskstart": T // 4, "maskend": 3 * T // 4,
            "softnessL": 0.05, "softnessR": 0.05,
        })
        masked = audio * np.asarray(
            _mask_for_display(T, mask_args), np.float32)[None, None, :]
        self._save(masked, "inpaint_masked_input", step)

        cfg_scales = self.demo_config.get("demo_cfg_scales", [6.0])
        steps = self.demo_config.get("demo_steps", 50)
        variables = {"params": state.ema_params if state.ema_params is not None
                     else state.params}
        mc = getattr(model, "_multi_conditioner", None)
        conditioning = None
        if mc is not None:
            conditioning = metadata
        for scale in cfg_scales:
            out = generate_diffusion_cond_inpaint(
                model, variables, steps=steps, cfg_scale=scale,
                conditioning=conditioning, batch_size=audio.shape[0],
                sample_size=T, seed=step,
                init_audio=(self.sample_rate, jnp.asarray(audio)),
                mask_args=mask_args,
            )
            self._save(np.asarray(out), f"inpaint_cfg{scale}", step,
                       caption=f"inpaint cfg={scale}")


def _mask_for_display(sample_size, mask_args):
    from ..inference.generation import build_mask

    return build_mask(sample_size, mask_args)


class DiffusionAutoencoderDemoCallback(_DemoBase):
    """Diffusion-AE reconstruction demo (reference training/diffusion.py:
    1080-1166): encode demo reals to latents, decode through the diffusion
    decoder, log real + recon audio and the latents."""

    def __init__(self, model_config, demo_dir, demo_config, demo_dl, logger=None):
        super().__init__(model_config, demo_dir, demo_config, logger)
        self.demo_dl = demo_dl

    def __call__(self, model, wrapper, state, step: int):
        import jax
        import jax.numpy as jnp

        if self.demo_dl is None:
            return
        num_demos = self.demo_config.get("num_demos", 2)
        audio, _ = next(iter(self.demo_dl))
        audio = jnp.asarray(np.asarray(audio)[:num_demos])
        variables = {"params": state.ema_params if state.ema_params is not None
                     else state.params}
        steps = self.demo_config.get("demo_steps", 50)
        if not hasattr(self, "_recon_jit"):
            def _recon(v, audio, rng):
                latents = model.apply(
                    v, audio, method=model.encode, rngs={"sample": rng})
                recon = model.apply(
                    v, latents, steps, method=model.decode,
                    rngs={"sample": jax.random.fold_in(rng, 1)})
                return recon, latents

            self._recon_jit = jax.jit(_recon)
        recon, latents = self._recon_jit(variables, audio,
                                         jax.random.PRNGKey(step))
        self._save(np.asarray(audio), "diffae_reals", step)
        self._save(np.asarray(recon), "diffae_recon", step,
                   latents=np.asarray(latents))


class DiffusionUncondDemoCallback(_DemoBase):
    def __call__(self, model, wrapper, state, step: int):
        from ..inference.generation import generate_diffusion_uncond

        variables = {"params": state.ema_params if state.ema_params is not None
                     else state.params}
        audio = generate_diffusion_uncond(
            model, variables, steps=self.demo_config.get("demo_steps", 50),
            batch_size=self.demo_config.get("num_demos", 2),
            sample_size=self.sample_size, seed=step,
        )
        self._save(np.asarray(audio), "demo", step)


class LMDemoCallback(_DemoBase):
    """AR-generate demo audio from the LM (reference training/lm.py:182-264)."""

    def __call__(self, model, wrapper, state, step: int):
        import jax
        import jax.numpy as jnp

        from ..models.lm import lm_generate_audio

        variables = {"params": state.ema_params if state.ema_params is not None
                     else state.params}
        mc = getattr(model, "_multi_conditioner", None)
        cond_tensors = None
        if mc is not None:
            demo_cond = self.demo_config.get("demo_cond", [{"prompt": "demo"}])
            prepared = jax.tree_util.tree_map(
                jnp.asarray, mc.gather_inputs(demo_cond)
            )
            cond_tensors = model.apply(variables, prepared,
                                       method=model.run_conditioner)
        max_gen_len = self.demo_config.get(
            "demo_max_gen_len",
            self.sample_size // model.min_input_length,
        )
        audio = lm_generate_audio(
            model, variables, conditioning_tensors=cond_tensors,
            max_gen_len=max_gen_len, rng=jax.random.PRNGKey(step),
            cfg_scale=self.demo_config.get("demo_cfg_scale", None),
        )
        self._save(np.asarray(audio), "lm_demo", step)


class AutoencoderDemoCallback(_DemoBase):
    def __init__(self, model_config, demo_dir, demo_config, demo_dl, logger=None):
        super().__init__(model_config, demo_dir, demo_config, logger)
        self.demo_dl = demo_dl

    def __call__(self, model, wrapper, state, step: int):
        import jax
        import jax.numpy as jnp

        if self.demo_dl is None:
            return
        audio, _ = next(iter(self.demo_dl))
        params = wrapper.export_params(state)
        variables = {"params": params}
        if state.quantizer_state is not None:
            variables["quantizer_state"] = state.quantizer_state
        latents = model.apply(
            variables, jnp.asarray(audio),
            rngs={"sample": jax.random.PRNGKey(step)}, method=model.encode,
        )
        recon = model.apply(variables, latents, method=model.decode)
        self._save(np.asarray(recon), "recon", step, latents=np.asarray(latents))
        self._save(np.asarray(audio), "real", step)
        if self.demo_config.get("compute_fad", False):
            # optional FAD(recon, reals) on the in-repo CLAP tower
            # (eval/fad.py; BASELINE north-star instrument)
            from ..eval.fad import fad_between

            fad = fad_between(
                np.asarray(audio), np.asarray(recon), self.sample_rate,
                clap_ckpt_path=self.demo_config.get("fad_clap_ckpt_path"),
                allow_random_init=not self.demo_config.get("fad_clap_ckpt_path"),
                audio_model_type=self.demo_config.get(
                    "fad_audio_model_type", "HTSAT-base"),
                enable_fusion=self.demo_config.get("fad_enable_fusion", False),
            )
            if self.logger is not None:
                from .utils import log_metric

                log_metric(self.logger, "demo/fad_recon", fad, step=step)
        self._disc_sensitivity_probe(wrapper, state, jnp.asarray(audio), recon,
                                     step)

    def _disc_sensitivity_probe(self, wrapper, state, reals, fakes, step: int):
        """Discriminator sensitivity spectrogram (reference
        training/autoencoders.py:597-611 retain_grad probe): |d(adv+fm gen
        loss)/d(fake audio)| rendered as a mel spectrogram shows which
        time-frequency regions the discriminator currently pushes the
        generator on."""
        disc = getattr(wrapper, "discriminator", None)
        disc_params = getattr(state, "disc_params", None)
        if disc is None or disc_params is None:
            return
        import jax
        import jax.numpy as jnp

        def gen_signal(fakes):
            _, adv, fm = disc.apply(
                {"params": disc_params}, reals, fakes, method=disc.loss
            )
            return adv + fm

        g = np.abs(np.asarray(jax.grad(gen_signal)(fakes)))
        try:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt

            from ..interface.aeiou import audio_spectrogram_image

            img = audio_spectrogram_image(g[0], self.sample_rate)
            plt.imsave(os.path.join(
                self.demo_dir, f"disc_sensitivity_step{step}.png"), img)
            if self.logger is not None:
                from .utils import log_image

                log_image(self.logger, "demo/disc_sensitivity", img, step=step)
        except Exception:
            pass
