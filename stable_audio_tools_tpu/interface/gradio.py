"""Gradio UI (reference interface/gradio.py + interfaces/diffusion_cond.py).

`load_model` + per-model-type UI dispatch. The gradio package isn't baked into
this image; the module imports cleanly and `create_ui` raises a clear error
if gradio is missing at call time.
"""

from __future__ import annotations

import json
import typing as tp

import numpy as np

_model_state: dict = {}


def load_model(model_config=None, model_ckpt_path=None, pretrained_name=None,
               device=None):
    """Build model + variables from config/ckpt (reference gradio.py:29-75)."""
    import jax
    import jax.numpy as jnp

    from ..models.factory import create_model_from_config
    from ..io.checkpoints import load_checkpoint, load_ckpt_state_dict, copy_state_dict

    if pretrained_name is not None:
        from ..models.pretrained import get_pretrained_model

        model, model_config, variables = get_pretrained_model(pretrained_name)
    else:
        if isinstance(model_config, str):
            with open(model_config) as f:
                model_config = json.load(f)
        model = create_model_from_config(model_config)
        # template init
        model_type = model_config["model_type"]
        rng = jax.random.PRNGKey(0)
        rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1),
                "cfg": jax.random.fold_in(rng, 2)}
        if model_type == "autoencoder":
            io_ch = model_config["model"]["io_channels"]
            audio = jnp.zeros((1, io_ch, model.downsampling_ratio * 4))
            variables = jax.jit(model.init)(rngs, audio)
        else:
            mc = getattr(model, "_multi_conditioner", None)
            prepared = None
            if mc is not None:
                meta = [{c["id"]: (0 if c["type"] in ("int", "number") else "")
                         for c in model_config["model"]["conditioning"]["configs"]}]
                prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(meta))
            ratio = (model.pretransform.downsampling_ratio
                     if model.pretransform is not None else 1)
            x = jnp.zeros((1, model.io_channels,
                           max(model_config["sample_size"] // ratio, 8)))
            t = jnp.ones((1,))
            kwargs = {"cond": prepared} if prepared is not None else {}
            variables = jax.jit(
                lambda x, t: model.init(rngs, x, t, method=model.init_full, **kwargs)
            )(x, t)
        if model_ckpt_path:
            if model_ckpt_path.endswith(".safetensors"):
                sd = load_ckpt_state_dict(model_ckpt_path)
                params, loaded, _ = copy_state_dict(variables["params"], sd)
                variables = {**variables, "params": params}
            else:
                ckpt = load_checkpoint(model_ckpt_path, None)
                if isinstance(ckpt, dict) and "params" in ckpt:
                    variables = {"params": ckpt["params"]}

    _model_state.update(model=model, variables=variables, config=model_config)
    return model, model_config


def generate_cond_fn(prompt, negative_prompt=None, seconds_start=0,
                     seconds_total=30, cfg_scale=6.0, steps=100, seed=-1,
                     sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500,
                     cfg_rescale=0.0, batch_size=1, init_audio=None,
                     init_noise_level=1.0):
    """Backend for the text-to-audio tab (interfaces/diffusion_cond.py:34-260)."""
    from ..inference.generation import generate_diffusion_cond

    model = _model_state["model"]
    variables = _model_state["variables"]
    config = _model_state["config"]
    conditioning = [{
        "prompt": prompt,
        "seconds_start": seconds_start,
        "seconds_total": seconds_total,
    }] * batch_size
    negative_conditioning = None
    if negative_prompt:
        negative_conditioning = [{
            "prompt": negative_prompt,
            "seconds_start": seconds_start,
            "seconds_total": seconds_total,
        }] * batch_size
    audio = generate_diffusion_cond(
        model, variables, steps=int(steps), cfg_scale=cfg_scale,
        conditioning=conditioning, negative_conditioning=negative_conditioning,
        batch_size=batch_size, sample_size=config["sample_size"], seed=int(seed),
        sampler_type=sampler_type, sigma_min=sigma_min, sigma_max=sigma_max,
        scale_phi=cfg_rescale,
        init_audio=init_audio, init_noise_level=init_noise_level,
    )
    audio = np.asarray(audio)
    peak = np.abs(audio).max() or 1.0
    return (config["sample_rate"], (audio[0].T / peak * 0.95))


def autoencoder_process_fn(audio_sr, latent_noise=0.0):
    """AE round-trip backend (reference gradio.py:257-329)."""
    import jax
    import jax.numpy as jnp

    model = _model_state["model"]
    variables = _model_state["variables"]
    sr, audio = audio_sr
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    else:
        audio = audio.T
    from ..inference.utils import prepare_audio

    audio = prepare_audio(audio, sr, model.sample_rate,
                          (audio.shape[-1] // model.downsampling_ratio)
                          * model.downsampling_ratio, model.io_channels)
    rng = jax.random.PRNGKey(0)
    latents = model.apply(variables, jnp.asarray(audio),
                          rngs={"sample": rng}, method=model.encode)
    if latent_noise > 0:
        latents = latents + latent_noise * jax.random.normal(rng, latents.shape)
    recon = model.apply(variables, latents, method=model.decode)
    return (model.sample_rate, np.asarray(recon)[0].T)


def create_ui(model_config_path=None, ckpt_path=None, pretrained_name=None,
              model_half=False):
    """Build the gradio app (reference gradio.py:356-378)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this environment; install gradio to "
            "use the web interface. All generation backends are available "
            "programmatically via interface.gradio.generate_cond_fn."
        ) from e

    model, model_config = load_model(
        model_config=model_config_path, model_ckpt_path=ckpt_path,
        pretrained_name=pretrained_name,
    )
    model_type = model_config["model_type"]

    with gr.Blocks() as ui:
        if model_type in ("diffusion_cond", "diffusion_cond_inpaint"):
            with gr.Tab("Generation"):
                prompt = gr.Textbox(label="Prompt")
                negative = gr.Textbox(label="Negative prompt")
                seconds_start = gr.Slider(0, 512, 0, label="Seconds start")
                seconds_total = gr.Slider(0, 512, 30, label="Seconds total")
                steps = gr.Slider(1, 500, 100, label="Steps")
                cfg = gr.Slider(0, 25, 6, label="CFG scale")
                sampler = gr.Dropdown(
                    ["dpmpp-3m-sde", "dpmpp-2m-sde", "dpmpp-2m", "k-heun",
                     "k-lms", "k-dpmpp-2s-ancestral", "v-ddim", "euler",
                     "pingpong"],
                    value="dpmpp-3m-sde", label="Sampler",
                )
                seed = gr.Number(-1, label="Seed")
                out = gr.Audio(label="Output")
                gr.Button("Generate").click(
                    lambda *a: generate_cond_fn(*a),
                    inputs=[prompt, negative, seconds_start, seconds_total,
                            cfg, steps, seed, sampler],
                    outputs=out,
                )
        elif model_type == "autoencoder":
            with gr.Tab("Autoencoder"):
                inp = gr.Audio(label="Input audio")
                noise = gr.Slider(0, 1, 0, label="Latent noise")
                out = gr.Audio(label="Reconstruction")
                gr.Button("Process").click(
                    autoencoder_process_fn, inputs=[inp, noise], outputs=out
                )
        elif model_type == "diffusion_uncond":
            with gr.Tab("Generation"):
                steps = gr.Slider(1, 500, 100, label="Steps")
                out = gr.Audio(label="Output")

                def _gen(steps):
                    from ..inference.generation import generate_diffusion_uncond

                    audio = generate_diffusion_uncond(
                        _model_state["model"], _model_state["variables"],
                        steps=int(steps),
                        sample_size=model_config["sample_size"],
                    )
                    return (model_config["sample_rate"], np.asarray(audio)[0].T)

                gr.Button("Generate").click(_gen, inputs=[steps], outputs=out)
    return ui
