"""Gradio UI (reference interface/gradio.py + interfaces/diffusion_cond.py).

`load_model` + per-model-type UI dispatch: text-to-audio (with init-audio
variations, inpainting, preview spectrograms, per-objective sampler controls,
ffmpeg export), autoencoder round-trip, unconditional diffusion, and the
audio LM tab (reference gradio.py:331-355).

The gradio package isn't baked into this image; the module imports cleanly,
every backend function is usable programmatically, and `create_ui` raises a
clear error if gradio is missing at call time.
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
        # shared template init (handles every model_type, merges all codec
        # collections, imports configured pretransform ckpts)
        from ..models.handle import init_variables_from_config

        variables = init_variables_from_config(model, model_config)
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


def _spectrogram(audio: np.ndarray, sample_rate: int):
    """[C, T] → spectrogram image array via the aeiou port."""
    from .aeiou import audio_spectrogram_image

    return audio_spectrogram_image(audio, sample_rate=sample_rate)


def _decode_previews(model, variables, preview_every, diffusion_objective,
                     sample_rate):
    """Decode every-Nth (denoised latent, sigma) pair collected by the
    in-scan preview tap into captioned spectrograms (reference
    interfaces/diffusion_cond.py:163-182 logSNR captions)."""
    import math

    import jax
    import jax.numpy as jnp

    buf = list(getattr(model, "_preview_buffer", []) or [])
    images = []
    for i, (latent, sigma) in enumerate(buf):
        if i % max(int(preview_every), 1) != 0:
            continue
        if diffusion_objective == "v":
            t = math.atan(sigma) / math.pi * 2
            alpha, s = math.cos(t * math.pi / 2), math.sin(t * math.pi / 2)
            log_snr = math.log(alpha / s + 1e-6)
        else:
            log_snr = math.log((1 - sigma) / max(sigma, 1e-6) + 1e-6)
        if model.pretransform is not None:
            audio = model.apply(variables, jnp.asarray(latent),
                                rngs={"sample": jax.random.PRNGKey(0)},
                                method=model.pretransform_decode)
        else:
            audio = latent
        audio = np.asarray(audio)[0]
        images.append((
            _spectrogram(audio, sample_rate),
            f"call {i} sigma={sigma:.3f} logSNR={log_snr:.3f}",
        ))
    return images


def generate_cond_fn(prompt, negative_prompt=None, seconds_start=0,
                     seconds_total=30, cfg_scale=6.0, steps=100,
                     preview_every=0, seed=-1,
                     sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500,
                     rho=1.0, cfg_interval_min=0.0, cfg_interval_max=1.0,
                     cfg_rescale=0.0, file_format="wav", file_naming="output.wav",
                     cut_to_seconds_total=True, init_audio=None,
                     init_noise_level=1.0, mask_maskstart=None,
                     mask_maskend=None, inpaint_audio=None, batch_size=1,
                     out_dir="."):
    """Backend for the text-to-audio tab (interfaces/diffusion_cond.py:37-290).

    Returns (output_file_path, [spectrogram images (incl. previews)]).
    """
    from ..inference.generation import (
        generate_diffusion_cond,
        generate_diffusion_cond_inpaint,
    )
    from ..inference.utils import prepare_audio
    from .export import output_basename, save_output

    model = _model_state["model"]
    variables = _model_state["variables"]
    config = _model_state["config"]
    sample_rate = config["sample_rate"]
    sample_size = config["sample_size"]
    seed = int(seed)
    if seed == -1:
        seed = int(np.random.randint(0, 2 ** 31 - 1))

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

    def _prep(audio_sr):
        in_sr, audio = audio_sr
        audio = np.asarray(audio)
        # gradio's numpy audio arrives as int16 — rescale BEFORE any cast
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        elif audio.dtype == np.int32:
            audio = audio.astype(np.float32) / 2147483648.0
        audio = audio.astype(np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        elif audio.shape[0] > audio.shape[1]:
            audio = audio.T
        audio = prepare_audio(audio, in_sr, sample_rate, sample_size,
                              model.io_channels
                              if model.pretransform is None
                              else config["audio_channels"])
        return (sample_rate, audio)

    gen_kwargs = dict(
        steps=int(steps), cfg_scale=cfg_scale,
        conditioning=conditioning,
        batch_size=batch_size, sample_size=sample_size, seed=seed,
        sampler_type=sampler_type, sigma_min=sigma_min, sigma_max=sigma_max,
        rho=rho, cfg_interval=(float(cfg_interval_min), float(cfg_interval_max)),
        scale_phi=cfg_rescale,
        preview=bool(preview_every and int(preview_every) > 0),
    )

    model_type = config["model_type"]
    if model_type == "diffusion_cond_inpaint" and inpaint_audio is not None:
        mask_args = {
            "maskstart": int(float(mask_maskstart or 0) * sample_rate),
            "maskend": int(float(mask_maskend or sample_size / sample_rate)
                           * sample_rate),
        }
        audio = generate_diffusion_cond_inpaint(
            model, variables, init_audio=_prep(inpaint_audio),
            mask_args=mask_args,
            negative_conditioning=negative_conditioning, **gen_kwargs,
        )
    else:
        gen_kwargs["negative_conditioning"] = negative_conditioning
        if init_audio is not None:
            gen_kwargs.update(init_audio=_prep(init_audio),
                              init_noise_level=init_noise_level)
        audio = generate_diffusion_cond(model, variables, **gen_kwargs)

    audio = np.asarray(audio)
    if cut_to_seconds_total:
        audio = audio[..., : int(seconds_total) * sample_rate]
    flat = audio.transpose(1, 0, 2).reshape(audio.shape[1], -1)  # d (b n)

    images = [_spectrogram(flat, sample_rate)]
    if gen_kwargs["preview"]:
        images += _decode_previews(
            model, variables, preview_every,
            getattr(model, "diffusion_objective", "v"), sample_rate,
        )

    basename = output_basename(
        "verbose" if file_naming == "verbose" else
        ("prompt" if file_naming == "prompt" else "output"),
        prompt or "", negative_prompt or "", cfg_scale, seed,
    )
    path = save_output(flat, sample_rate, file_format, basename, out_dir,
                       cleanup_delay=30.0 if file_naming != "output.wav" else 0.0)
    return path, images


def generate_lm_fn(temperature=1.0, top_p=0.95, top_k=0, seconds_total=10.0,
                   prompt=None, seed=-1, int8_decode=False):
    """Backend for the LM tab (reference gradio.py:331-355 generate_lm)."""
    import jax

    from ..models.lm import lm_generate_audio

    model = _model_state["model"]
    variables = _model_state["variables"]
    config = _model_state["config"]
    sample_rate = config["sample_rate"]
    seed = int(seed)
    if seed == -1:
        seed = int(np.random.randint(0, 2 ** 31 - 1))

    cond_tensors = None
    mc = getattr(model, "_multi_conditioner", None)
    if mc is not None and prompt:
        import jax.numpy as jnp

        prepared = jax.tree_util.tree_map(
            jnp.asarray, mc.gather_inputs([{"prompt": prompt}])
        )
        cond_tensors = model.apply(variables, prepared,
                                   method=model.run_conditioner)

    max_gen_len = int(float(seconds_total) * sample_rate
                      // model.min_input_length)
    audio = lm_generate_audio(
        model, variables, conditioning_tensors=cond_tensors,
        max_gen_len=max(max_gen_len, 8),
        temp=float(temperature), top_p=float(top_p), top_k=int(top_k),
        rng=jax.random.PRNGKey(seed),
        weight_quant="int8" if int8_decode else None,
    )
    audio = np.asarray(audio)[0]
    peak = np.abs(audio).max() or 1.0
    return ((sample_rate, (audio / peak * 0.95).T),
            [_spectrogram(audio, sample_rate)])


def generate_uncond_fn(steps=100, seed=-1, batch_size=1, sample_size=None,
                       init_audio=None, init_noise_level=1.0,
                       sampler_type="dpmpp-2m-sde"):
    """Backend for unconditional diffusion (reference gradio.py:81-128)."""
    from ..inference.generation import generate_diffusion_uncond

    model = _model_state["model"]
    variables = _model_state["variables"]
    config = _model_state["config"]
    audio = generate_diffusion_uncond(
        model, variables, steps=int(steps), seed=int(seed),
        batch_size=int(batch_size),
        sample_size=int(sample_size or config["sample_size"]),
        init_audio=init_audio, init_noise_level=init_noise_level,
        sampler_type=sampler_type,
    )
    audio = np.asarray(audio)
    flat = audio.transpose(1, 0, 2).reshape(audio.shape[1], -1)
    peak = np.abs(flat).max() or 1.0
    return ((config["sample_rate"], (flat / peak * 0.95).T),
            [_spectrogram(flat, config["sample_rate"])])


def autoencoder_process_fn(audio_sr, latent_noise=0.0, n_quantizers=None):
    """AE round-trip backend (reference gradio.py:257-329)."""
    import jax
    import jax.numpy as jnp

    model = _model_state["model"]
    variables = _model_state["variables"]
    sr, audio = audio_sr
    audio = np.asarray(audio)
    # gradio numpy audio is int16 — rescale before the float cast
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 32768.0
    elif audio.dtype == np.int32:
        audio = audio.astype(np.float32) / 2147483648.0
    audio = audio.astype(np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    else:
        audio = audio.T
    from ..inference.utils import prepare_audio

    audio = prepare_audio(audio, sr, model.sample_rate,
                          (audio.shape[-1] // model.downsampling_ratio)
                          * model.downsampling_ratio, model.io_channels)
    rng = jax.random.PRNGKey(0)
    enc_kwargs = {}
    if n_quantizers:
        # limits the RVQ depth on discrete bottlenecks (reference
        # gradio.py:291-300); continuous bottlenecks ignore it
        enc_kwargs["n_quantizers"] = int(n_quantizers)
    latents = model.apply(variables, jnp.asarray(audio),
                          rngs={"sample": rng}, method=model.encode,
                          **enc_kwargs)
    if latent_noise > 0:
        latents = latents + latent_noise * jax.random.normal(rng, latents.shape)
    recon = model.apply(variables, latents, method=model.decode)
    return (model.sample_rate, np.asarray(recon)[0].T)


SAMPLERS_BY_OBJECTIVE = {
    # reference interfaces/diffusion_cond.py:362-371
    "v": (["dpmpp-2m-sde", "dpmpp-3m-sde", "dpmpp-2m", "k-heun", "k-lms",
           "k-dpmpp-2s-ancestral", "k-dpm-2", "k-dpm-adaptive", "k-dpm-fast",
           "v-ddim", "v-ddim-cfgpp"], "dpmpp-3m-sde", 100, 7.0),
    "rectified_flow": (["euler", "rk4", "dpmpp"], "euler", 50, 7.0),
    "rf_denoiser": (["pingpong"], "pingpong", 8, 1.0),
}


# Page-load script for the cond-diffusion tab's playback controls
# (reference interfaces/diffusion_cond.py:457-519): "Infinite Radio"
# re-triggers Generate shortly before the output finishes so playback never
# stops; Autoplay starts each result; Auto Download saves it; media-session
# keys (>>, play/pause) map onto the same controls.
_PLAYBACK_JS = """
function on_page_load() {
  const byId = (id) => document.querySelector(`#${id} input[type="checkbox"]`);
  const genBtn = () => Array.from(document.querySelectorAll("button"))
      .find((b) => b.innerText.trim() === "Generate");
  const outAudio = () => document.querySelector("#output-audio audio");

  let chainNext = false;   // radio requested the current generation
  let armed = null;        // audio element we've already wired

  function saveFile(el) {
    const a = document.createElement("a");
    a.href = el.src;
    a.download = el.src.split("/").pop() || "output.wav";
    a.click();
  }

  function arm() {
    const el = outAudio();
    if (!el || el === armed) return;
    armed = el;
    el.addEventListener("loadedmetadata", () => {
      if (byId("automatic-download")?.checked) saveFile(el);
      if (byId("autoplay")?.checked || chainNext) { el.play(); chainNext = false; }
    });
    el.addEventListener("timeupdate", () => {
      if (!byId("infinite-radio")?.checked || chainNext) return;
      if (el.duration && el.duration - el.currentTime <= 1.0) {
        chainNext = true;
        genBtn()?.click();
      }
    });
  }

  // the audio element is created lazily by gradio: watch for it
  new MutationObserver(arm).observe(document.body,
      { childList: true, subtree: true });
  arm();

  if ("mediaSession" in navigator) {
    navigator.mediaSession.setActionHandler("nexttrack", () => genBtn()?.click());
    navigator.mediaSession.setActionHandler("play", () => outAudio()?.play());
    navigator.mediaSession.setActionHandler("pause", () => outAudio()?.pause());
  }
}
"""


def create_ui(model_config_path=None, ckpt_path=None, pretrained_name=None,
              model_half=False, gradio_title=""):
    """Build the gradio app (reference gradio.py:356-378)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this environment; install gradio to "
            "use the web interface. All generation backends are available "
            "programmatically via interface.gradio.*_fn."
        ) from e

    model, model_config = load_model(
        model_config=model_config_path, model_ckpt_path=ckpt_path,
        pretrained_name=pretrained_name,
    )
    model_type = model_config["model_type"]
    sample_rate = model_config["sample_rate"]
    sample_size = model_config["sample_size"]

    is_cond = model_type in ("diffusion_cond", "diffusion_cond_inpaint")
    with gr.Blocks(title=gradio_title or "stable-audio-tools-tpu",
                   js=_PLAYBACK_JS if is_cond else None) as ui:
        if is_cond:
            objective = getattr(model, "diffusion_objective", "v")
            samplers, default_sampler, default_steps, default_cfg = (
                SAMPLERS_BY_OBJECTIVE.get(objective, SAMPLERS_BY_OBJECTIVE["v"])
            )
            is_rf = objective in ("rectified_flow", "rf_denoiser")
            cond_ids = {c["id"] for c in model_config["model"]
                        .get("conditioning", {}).get("configs", [])}
            with gr.Tab("Generation"):
                with gr.Row():
                    with gr.Column(scale=6):
                        prompt = gr.Textbox(show_label=False, placeholder="Prompt")
                        negative = gr.Textbox(show_label=False,
                                              placeholder="Negative prompt")
                    generate_btn = gr.Button("Generate", variant="primary", scale=1)
                with gr.Row(visible="seconds_start" in cond_ids
                            or "seconds_total" in cond_ids):
                    seconds_start = gr.Slider(
                        0, 512, 0, step=1, label="Seconds start",
                        visible="seconds_start" in cond_ids)
                    seconds_total = gr.Slider(
                        0, 512, sample_size // sample_rate, step=1,
                        label="Seconds total", visible="seconds_total" in cond_ids)
                with gr.Row():
                    steps = gr.Slider(1, 500, default_steps, step=1, label="Steps")
                    cfg = gr.Slider(0, 25, default_cfg, step=0.1, label="CFG scale")
                with gr.Accordion("Sampler params", open=False):
                    with gr.Row():
                        seed = gr.Textbox(label="Seed (-1 for random)", value="-1")
                        cfg_interval_min = gr.Slider(0, 1, 0.0, step=0.01,
                                                     label="CFG interval min")
                        cfg_interval_max = gr.Slider(0, 1, 1.0, step=0.01,
                                                     label="CFG interval max")
                    with gr.Row():
                        cfg_rescale = gr.Slider(0, 1, 0.0, step=0.01,
                                                label="CFG rescale amount")
                    with gr.Row():
                        sampler = gr.Dropdown(samplers, value=default_sampler,
                                              label="Sampler type")
                        sigma_min = gr.Slider(0, 2.0, 0.01, step=0.01,
                                              label="Sigma min", visible=not is_rf)
                        sigma_max = gr.Slider(0, 1000.0, 100, step=0.1,
                                              label="Sigma max", visible=not is_rf)
                        rho = gr.Slider(0, 10.0, 1.0, step=0.01,
                                        label="Sigma curve strength",
                                        visible=not is_rf)
                with gr.Accordion("Output params", open=False):
                    with gr.Row():
                        from .export import FILE_FORMATS

                        file_format = gr.Dropdown(list(FILE_FORMATS),
                                                  value="wav", label="File format")
                        file_naming = gr.Dropdown(
                            ["verbose", "prompt", "output.wav"],
                            value="output.wav", label="File naming")
                        preview_every = gr.Slider(0, 100, 0, step=1,
                                                  label="Spec preview every")
                        cut_to_total = gr.Checkbox(label="Cut to seconds total",
                                                   value=True)
                    with gr.Row():
                        # playback controls consumed by _PLAYBACK_JS
                        gr.Checkbox(label="Autoplay", value=False,
                                    elem_id="autoplay")
                        gr.Checkbox(label="Infinite Radio", value=False,
                                    elem_id="infinite-radio")
                        gr.Checkbox(label="Auto Download", value=False,
                                    elem_id="automatic-download")
                with gr.Accordion("Init audio", open=False):
                    init_audio = gr.Audio(label="Init audio")
                    init_noise = gr.Slider(
                        0.01 if is_rf else 0.1, 1.0 if is_rf else 100.0,
                        0.1, step=0.01, label="Init noise level")
                with gr.Accordion("Inpainting", open=False,
                                  visible=model_type == "diffusion_cond_inpaint"):
                    inpaint_audio = gr.Audio(label="Inpaint audio")
                    mask_start = gr.Slider(0, sample_size // sample_rate, 10,
                                           step=0.1, label="Mask start (sec)")
                    mask_end = gr.Slider(0, sample_size // sample_rate,
                                         sample_size // sample_rate,
                                         step=0.1, label="Mask end (sec)")
                out_audio = gr.Audio(label="Output audio", interactive=False,
                                     type="filepath", elem_id="output-audio")
                out_spec = gr.Gallery(label="Output spectrogram", show_label=False)
                send_to_init = gr.Button("Send to init audio")
                send_to_init.click(lambda a: a, inputs=[out_audio],
                                   outputs=[init_audio])
                generate_btn.click(
                    generate_cond_fn,
                    inputs=[prompt, negative, seconds_start, seconds_total,
                            cfg, steps, preview_every, seed, sampler,
                            sigma_min, sigma_max, rho, cfg_interval_min,
                            cfg_interval_max, cfg_rescale, file_format,
                            file_naming, cut_to_total, init_audio, init_noise,
                            mask_start, mask_end, inpaint_audio],
                    outputs=[out_audio, out_spec], api_name="generate",
                )
        elif model_type in ("autoencoder", "diffusion_autoencoder"):
            with gr.Tab("Autoencoder"):
                bn = getattr(model, "bottleneck", None)
                is_rvq = bn is not None and getattr(bn, "num_quantizers", 0) > 1
                inp = gr.Audio(label="Input audio")
                nq = gr.Slider(1, getattr(bn, "num_quantizers", 1), step=1,
                               value=getattr(bn, "num_quantizers", 1),
                               label="# quantizers", visible=is_rvq)
                noise = gr.Slider(0, 10, 0, step=0.001, label="Add latent noise")
                out = gr.Audio(label="Reconstruction")
                gr.Button("Process", variant="primary").click(
                    autoencoder_process_fn, inputs=[inp, noise, nq],
                    outputs=out, api_name="process",
                )
        elif model_type == "diffusion_uncond":
            with gr.Tab("Generation"):
                steps = gr.Slider(1, 500, 100, step=1, label="Steps")
                seed = gr.Textbox(label="Seed (-1 for random)", value="-1")
                out = gr.Audio(label="Output")
                out_spec = gr.Gallery(label="Output spectrogram", show_label=False)
                gr.Button("Generate", variant="primary").click(
                    lambda s, sd: generate_uncond_fn(steps=s, seed=sd),
                    inputs=[steps, seed], outputs=[out, out_spec],
                    api_name="generate",
                )
        elif model_type == "lm":
            with gr.Tab("Generation"):
                prompt = gr.Textbox(label="Prompt (optional)")
                with gr.Row():
                    temperature = gr.Slider(0, 5, 1.0, step=0.01,
                                            label="Temperature")
                    top_p = gr.Slider(0, 1, 0.95, step=0.01, label="Top p")
                    int8_decode = gr.Checkbox(
                        False, label="int8 weight-only decode (faster)")
                    top_k = gr.Slider(0, 100, 0, step=1, label="Top k")
                seconds_total = gr.Slider(1, 60, 10, step=1, label="Seconds")
                out = gr.Audio(label="Output audio", interactive=False)
                out_spec = gr.Gallery(label="Output spectrogram", show_label=False)
                gr.Button("Generate", variant="primary").click(
                    lambda t, p, k, s, pr, q8: generate_lm_fn(
                        temperature=t, top_p=p, top_k=k, seconds_total=s,
                        prompt=pr, int8_decode=q8),
                    inputs=[temperature, top_p, top_k, seconds_total, prompt,
                            int8_decode],
                    outputs=[out, out_spec], api_name="generate",
                )
    return ui
