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

    if model_type in ("diffusion_cond", "diffusion_cond_inpaint"):
        return DiffusionCondDemoCallback(model_config, demo_dir, demo_config, logger)
    if model_type == "diffusion_uncond":
        return DiffusionUncondDemoCallback(model_config, demo_dir, demo_config, logger)
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

    def _save(self, audio: np.ndarray, name: str, step: int):
        from ..data.wav import save_wav
        from ..interface.aeiou import audio_spectrogram_image

        os.makedirs(self.demo_dir, exist_ok=True)
        audio = np.asarray(audio)
        peak = np.abs(audio).max() or 1.0
        for b in range(audio.shape[0]):
            path = os.path.join(self.demo_dir, f"{name}_step{step}_{b}.wav")
            save_wav(path, audio[b] / peak * 0.95, self.sample_rate)
        try:
            import matplotlib

            matplotlib.use("Agg")
            img = audio_spectrogram_image(audio[0], self.sample_rate)
            from matplotlib import pyplot as plt

            plt.imsave(os.path.join(
                self.demo_dir, f"{name}_step{step}_mel.png"), img)
        except Exception:
            pass


class DiffusionCondDemoCallback(_DemoBase):
    def __call__(self, model, wrapper, state, step: int):
        from ..inference.generation import generate_diffusion_cond

        prompts = self.demo_config.get("demo_cond", [
            {"prompt": "demo", "seconds_start": 0, "seconds_total": 10},
        ])
        cfg_scales = self.demo_config.get("demo_cfg_scales", [6.0])
        steps = self.demo_config.get("demo_steps", 50)
        variables = {"params": state.ema_params if state.ema_params is not None
                     else state.params}
        for scale in cfg_scales:
            audio = generate_diffusion_cond(
                model, variables, steps=steps, cfg_scale=scale,
                conditioning=list(prompts), batch_size=len(prompts),
                sample_size=self.sample_size, seed=step,
            )
            self._save(np.asarray(audio), f"demo_cfg{scale}", step)


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
        self._save(np.asarray(recon), "recon", step)
        self._save(np.asarray(audio), "real", step)
        try:
            from ..interface.aeiou import pca_point_cloud, tokens_spectrogram_image
            from matplotlib import pyplot as plt

            plt.imsave(os.path.join(self.demo_dir, f"latents_step{step}.png"),
                       tokens_spectrogram_image(np.asarray(latents)))
            plt.imsave(os.path.join(self.demo_dir, f"latents_pca_step{step}.png"),
                       pca_point_cloud(np.asarray(latents)))
        except Exception:
            pass
