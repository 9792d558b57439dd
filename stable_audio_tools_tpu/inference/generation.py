"""Top-level generation API.

Capability parity with reference stable_audio_tools/inference/generation.py:
generate_diffusion_cond (:91-220), generate_diffusion_uncond (:12-88),
generate_diffusion_cond_inpaint (:222-405), Hann-softened build_mask (:412).

TPU redesign: conditioning runs once (host + one jitted bank apply); the full
sampler loop (CFG batch-doubling included) is one jitted lax.scan program,
cached per (model, steps, sampler, shape) so repeated calls don't retrace.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import (
    DistributionShift,
    sample_k,
    sample_rf,
)


def _seed_rng(seed: int):
    if seed == -1:
        seed = int(np.random.randint(0, 2 ** 31 - 1))
    return jax.random.PRNGKey(seed), seed


def _latent_shape(model, batch_size, sample_size):
    if model.pretransform is not None:
        size = sample_size // model.pretransform.downsampling_ratio
        ch = model.pretransform.encoded_channels or model.io_channels
    else:
        size = sample_size
        ch = model.io_channels
    return (batch_size, ch, size)


def _get_dist_shift(model, seq_len):
    if getattr(model, "distribution_shift_options", None):
        return DistributionShift(**dict(model.distribution_shift_options))
    return None


def compute_conditioning_tensors(model, variables, conditioning, negative=False):
    """Host prepare + jitted ConditionerBank apply → {key: (tensor, mask)}."""
    mc = getattr(model, "_multi_conditioner", None)
    assert mc is not None, "Model has no conditioner attached"
    prepared = mc.gather_inputs(conditioning)
    prepared = jax.tree_util.tree_map(jnp.asarray, prepared)
    return model.apply(variables, prepared, method=model.run_conditioner)


def _jit_cache(model, key, builder):
    """Per-model cache of jitted sampler programs (avoids retracing per call)."""
    cache = getattr(model, "_gen_jit_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(model, "_gen_jit_cache", cache)
    if key not in cache:
        cache[key] = jax.jit(builder)
    return cache[key]


def _place_for_mesh(variables, noise, mesh, tp_rules=None):
    """Shard params (TP rules) + latent batch ('data') for multi-chip
    inference; GSPMD propagates through the fused sampler program."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DIT_TP_RULES, tp_param_sharding

    rules = DIT_TP_RULES if tp_rules is None else tp_rules
    variables = jax.device_put(variables, tp_param_sharding(variables, mesh, rules))
    if "data" in mesh.shape and noise.shape[0] % mesh.shape["data"] == 0:
        bspec = P("data", *([None] * (noise.ndim - 1)))
    else:
        bspec = P()
    noise = jax.device_put(noise, NamedSharding(mesh, bspec))
    return variables, noise



def _chunk_decode_kwargs(model, mesh):
    """Shard the chunked codec's chunk axis over every mesh device (the
    sampler's TP/DP sharding doesn't help the conv decoder; distributing
    chunks does — ~n_devices x on long outputs)."""
    if mesh is None or model.pretransform is None:
        return {}
    if not getattr(model.pretransform, "chunked", False):
        return {}
    from jax.sharding import PartitionSpec as P

    return {"chunk_pspec": P(tuple(mesh.axis_names))}


def get_preview_tap(model):
    """A stable host-callback that collects (denoised_latent, sigma) pairs
    streamed out of the fused sampler scan (io_callback). Stable identity per
    model so the jitted program (which embeds the callable) stays cached;
    read/clear the buffer via model._preview_buffer."""
    tap = getattr(model, "_preview_tap", None)
    if tap is None:
        buf = []

        def tap(denoised, sigma):
            buf.append((np.asarray(denoised), float(sigma)))

        object.__setattr__(model, "_preview_buffer", buf)
        object.__setattr__(model, "_preview_tap", tap)
    return tap


def _call_with_mesh(fn, mesh, *args):
    """Trace/execute under the mesh context so bare-PartitionSpec sharding
    constraints (chunked decode) resolve against it, and flag the trace as a
    mesh program (attention_core then avoids unpartitionable pallas calls)."""
    if mesh is None:
        return fn(*args)
    from jax.sharding import set_mesh

    from ..parallel.mesh import mesh_program_context

    with set_mesh(mesh), mesh_program_context(mesh):
        return fn(*args)


def generate_diffusion_uncond(
    model,
    variables,
    steps: int = 250,
    batch_size: int = 1,
    sample_size: int = 2097152,
    seed: int = -1,
    init_audio=None,
    init_noise_level: float = 1.0,
    sampler_type: str = "dpmpp-2m-sde",
    sigma_min: float = 0.3,
    sigma_max: float = 500.0,
    rho: float = 1.0,
    return_latents: bool = False,
    mesh=None,
    tp_rules=None,
    **sampler_kwargs,
):
    rng, seed = _seed_rng(seed)
    shape = _latent_shape(model, batch_size, sample_size)
    noise = jax.random.normal(jax.random.fold_in(rng, 0), shape)
    if mesh is not None:
        variables, noise = _place_for_mesh(variables, noise, mesh, tp_rules)

    init_data = None
    if init_audio is not None:
        in_sr, audio = init_audio
        audio = jnp.asarray(audio, jnp.float32)
        if audio.ndim == 2:
            audio = audio[None]
        if model.pretransform is not None:
            init_data = model.apply(
                variables, audio, method=model.pretransform_encode,
                rngs={"sample": jax.random.fold_in(rng, 99)},
            )
        else:
            init_data = audio
        sigma_max = init_noise_level

    diff_obj = getattr(model, "diffusion_objective", "v")
    chunk_kwargs = _chunk_decode_kwargs(model, mesh)
    key = (
        "uncond", steps, sampler_type, float(sigma_min), float(sigma_max),
        float(rho), shape, bool(return_latents), diff_obj,
        init_data is not None, tuple(sorted(sampler_kwargs.items())),
        bool(chunk_kwargs), mesh,  # Mesh is hashable; axis names/devices key
    )

    def build(variables, noise, init_data, rng):
        def model_fn(x, t, **kw):
            return model.apply(variables, x, t, **kw)

        if diff_obj == "v":
            out = sample_k(
                model_fn, noise, init_data=init_data, steps=steps,
                sampler_type=sampler_type, sigma_min=sigma_min, sigma_max=sigma_max,
                rho=rho, rng=jax.random.fold_in(rng, 1), **sampler_kwargs,
            )
        else:
            out = sample_rf(
                model_fn, noise, init_data=init_data, steps=steps,
                sampler_type=sampler_type, sigma_max=sigma_max,
                rng=jax.random.fold_in(rng, 1), **sampler_kwargs,
            )
        if not return_latents and model.pretransform is not None:
            out = model.apply(
                variables, out, method=model.pretransform_decode,
                rngs={"sample": jax.random.fold_in(rng, 98)},
                **chunk_kwargs,
            )
        return out

    fn = _jit_cache(model, key, build)
    return _call_with_mesh(fn, mesh, variables, noise, init_data, rng)


def generate_diffusion_cond(
    model,
    variables,
    steps: int = 250,
    cfg_scale: float = 6.0,
    conditioning: tp.Optional[tp.List[dict]] = None,
    conditioning_tensors=None,
    negative_conditioning: tp.Optional[tp.List[dict]] = None,
    negative_conditioning_tensors=None,
    batch_size: int = 1,
    sample_size: int = 2097152,
    seed: int = -1,
    init_audio=None,
    init_noise_level: float = 1.0,
    mask_args: tp.Optional[dict] = None,
    return_latents: bool = False,
    sampler_type: str = "dpmpp-3m-sde",
    sigma_min: float = 0.3,
    sigma_max: float = 500.0,
    rho: float = 1.0,
    cfg_interval: tp.Tuple[float, float] = (0.0, 1.0),
    scale_phi: float = 0.0,
    mesh=None,
    tp_rules=None,
    preview: bool = False,
    **sampler_kwargs,
):
    """Text/metadata-conditioned latent-diffusion generation.

    preview=True streams per-step denoised latents to model._preview_buffer via
    an in-scan host callback (clear it before the call; decode entries with
    pretransform_decode afterwards) — the reference's per-step progress
    callback surface (interfaces/diffusion_cond.py:163-182).

    model: ConditionedDiffusionModelWrapper (flax module from the factory);
    variables: its params. Returns audio [B, C, sample_size] (or latents).

    Multi-chip: pass a jax.sharding.Mesh with ('data', 'model') axes — params
    are tensor-parallel sharded by `tp_rules` (default parallel.mesh
    DIT_TP_RULES), the latent batch is sharded over 'data' when divisible,
    and XLA GSPMD inserts the collectives inside the one fused sampler.
    """
    rng, seed = _seed_rng(seed)
    shape = _latent_shape(model, batch_size, sample_size)
    noise = jax.random.normal(jax.random.fold_in(rng, 0), shape)
    if mesh is not None:
        variables, noise = _place_for_mesh(variables, noise, mesh, tp_rules)

    assert conditioning is not None or conditioning_tensors is not None, (
        "Must provide either conditioning or conditioning_tensors"
    )
    if conditioning_tensors is None:
        conditioning_tensors = compute_conditioning_tensors(model, variables, conditioning)
    cond_inputs = model.get_conditioning_inputs(conditioning_tensors)

    if negative_conditioning is not None or negative_conditioning_tensors is not None:
        if negative_conditioning_tensors is None:
            negative_conditioning_tensors = compute_conditioning_tensors(
                model, variables, negative_conditioning
            )
        neg_inputs = model.get_conditioning_inputs(
            negative_conditioning_tensors, negative=True
        )
    else:
        neg_inputs = {}

    init_data = None
    if init_audio is not None:
        in_sr, audio = init_audio
        audio = jnp.asarray(audio, jnp.float32)
        if audio.ndim == 2:
            audio = audio[None]
        if model.pretransform is not None:
            init_data = model.apply(
                variables, audio, method=model.pretransform_encode,
                rngs={"sample": jax.random.fold_in(rng, 99)},
            )
        else:
            init_data = audio
        sigma_max_eff = init_noise_level
    else:
        sigma_max_eff = sigma_max

    diff_obj = getattr(model, "diffusion_objective", "v")
    dist_shift = _get_dist_shift(model, shape[-1])
    if diff_obj in ("rectified_flow", "rf_denoiser") and sampler_type in (
        "dpmpp-3m-sde", "dpmpp-2m-sde",
    ):
        sampler_type = "euler"  # objective-appropriate default

    # one jitted program: sampler scan (+CFG inside the model) + VAE decode;
    # cached per static config so repeated generate calls don't retrace.
    neg_struct = tuple(sorted(k for k, v in neg_inputs.items() if v is not None))
    chunk_kwargs = _chunk_decode_kwargs(model, mesh)
    key = (
        "cond", steps, sampler_type, float(sigma_min), float(sigma_max_eff),
        float(rho), float(cfg_scale), float(scale_phi), tuple(cfg_interval),
        shape, bool(return_latents), diff_obj, neg_struct,
        init_data is not None, tuple(sorted(sampler_kwargs.items())),
        bool(chunk_kwargs), bool(preview), mesh,
    )
    if preview:
        sampler_kwargs = dict(sampler_kwargs,
                              denoised_tap=get_preview_tap(model))
        getattr(model, "_preview_buffer").clear()

    def build(variables, noise, cond_tensors, neg, init_data, rng):
        def model_fn(x, t, **kw):
            return model.apply(
                variables, x, t,
                cond_tensors=cond_tensors,
                cfg_scale=cfg_scale,
                scale_phi=scale_phi,
                cfg_interval=tuple(cfg_interval),
                **neg,
                **kw,
            )

        sampler_rng = jax.random.fold_in(rng, 1)
        if diff_obj == "v":
            out = sample_k(
                model_fn, noise, init_data=init_data, steps=steps,
                sampler_type=sampler_type, sigma_min=sigma_min,
                sigma_max=sigma_max_eff, rho=rho, rng=sampler_rng,
                **sampler_kwargs,
            )
        elif diff_obj in ("rectified_flow", "rf_denoiser"):
            out = sample_rf(
                model_fn, noise, init_data=init_data, steps=steps,
                sampler_type=sampler_type,
                sigma_max=min(sigma_max_eff, 1.0),
                dist_shift=dist_shift,
                rng=sampler_rng, **sampler_kwargs,
            )
        else:
            raise ValueError(f"Unknown diffusion objective {diff_obj}")

        if not return_latents and model.pretransform is not None:
            out = model.apply(
                variables, out, method=model.pretransform_decode,
                rngs={"sample": jax.random.fold_in(rng, 98)},
                **chunk_kwargs,
            )
        return out

    fn = _jit_cache(model, key, build)
    neg_clean = {k: v for k, v in neg_inputs.items() if v is not None}
    return _call_with_mesh(fn, mesh, variables, noise, conditioning_tensors,
                           neg_clean, init_data, rng)


def build_mask(sample_size: int, mask_args: dict):
    """Hann-softened inpainting mask (reference generation.py:412-429)."""
    maskstart = int(mask_args["maskstart"])
    maskend = int(mask_args["maskend"])
    softnessL = float(mask_args.get("softnessL", 0.0))
    softnessR = float(mask_args.get("softnessR", 0.0))
    marination = float(mask_args.get("marination", 0.0))
    hannL = int(softnessL * sample_size)
    hannR = int(softnessR * sample_size)
    mask = np.ones(sample_size, np.float32)
    mask[maskstart:maskend] = 0.0
    if hannL > 0:
        ramp = 0.5 * (1 + np.cos(np.linspace(0, np.pi, hannL)))
        lo = max(maskstart - hannL, 0)
        mask[lo:maskstart] = np.minimum(mask[lo:maskstart], ramp[-(maskstart - lo):])
    if hannR > 0:
        ramp = 0.5 * (1 - np.cos(np.linspace(0, np.pi, hannR)))
        hi = min(maskend + hannR, sample_size)
        mask[maskend:hi] = np.minimum(mask[maskend:hi], ramp[: hi - maskend])
    if marination > 0:
        mask = np.maximum(mask, marination)
    return jnp.asarray(mask)


def generate_diffusion_cond_inpaint(
    model,
    variables,
    steps: int = 250,
    cfg_scale: float = 6.0,
    conditioning=None,
    conditioning_tensors=None,
    negative_conditioning: tp.Optional[tp.List[dict]] = None,
    negative_conditioning_tensors=None,
    batch_size: int = 1,
    sample_size: int = 2097152,
    seed: int = -1,
    init_audio=None,
    mask_args: tp.Optional[dict] = None,
    return_latents: bool = False,
    sampler_type: str = "dpmpp-3m-sde",
    sigma_min: float = 0.3,
    sigma_max: float = 500.0,
    rho: float = 1.0,
    cfg_interval: tp.Tuple[float, float] = (0.0, 1.0),
    scale_phi: float = 0.0,
    mesh=None,
    tp_rules=None,
    preview: bool = False,
    **sampler_kwargs,
):
    """Inpainting via masked-input conditioning channels (reference :222-405).

    Expects the model to have been trained with inpaint_mask input-concat
    conditioning (model_type diffusion_cond_inpaint). Same fused one-program
    design as generate_diffusion_cond (jit-cached per static config).
    """
    rng, seed = _seed_rng(seed)
    shape = _latent_shape(model, batch_size, sample_size)
    ratio = (
        model.pretransform.downsampling_ratio if model.pretransform is not None else 1
    )
    latent_size = shape[-1]

    assert init_audio is not None, "inpainting requires init_audio"
    in_sr, audio = init_audio
    audio = jnp.asarray(audio, jnp.float32)
    if audio.ndim == 2:
        audio = audio[None]
    if model.pretransform is not None:
        init_latents = model.apply(
            variables, audio, method=model.pretransform_encode,
            rngs={"sample": jax.random.fold_in(rng, 99)},
        )
    else:
        init_latents = audio
    # align init latents to the generation length
    if init_latents.shape[-1] > latent_size:
        init_latents = init_latents[..., :latent_size]
    elif init_latents.shape[-1] < latent_size:
        init_latents = jnp.pad(
            init_latents,
            ((0, 0), (0, 0), (0, latent_size - init_latents.shape[-1])),
        )

    if mask_args is not None:
        mask = build_mask(sample_size, mask_args)
        latent_mask = mask[:: ratio][:latent_size]
    else:
        latent_mask = jnp.zeros((latent_size,))
    # masked input concat: latents where mask==1, zeros in the hole
    masked_input = init_latents * latent_mask[None, None, :]
    inpaint_cond = jnp.concatenate(
        [masked_input, jnp.broadcast_to(latent_mask[None, None, :],
                                        (batch_size, 1, latent_size))],
        axis=1,
    )

    if conditioning_tensors is None and conditioning is not None:
        conditioning_tensors = compute_conditioning_tensors(model, variables, conditioning)

    if negative_conditioning is not None or negative_conditioning_tensors is not None:
        if negative_conditioning_tensors is None:
            negative_conditioning_tensors = compute_conditioning_tensors(
                model, variables, negative_conditioning
            )
        neg_inputs = model.get_conditioning_inputs(
            negative_conditioning_tensors, negative=True
        )
    else:
        neg_inputs = {}

    noise = jax.random.normal(jax.random.fold_in(rng, 0), shape)
    if mesh is not None:
        variables, noise = _place_for_mesh(variables, noise, mesh, tp_rules)

    diff_obj = getattr(model, "diffusion_objective", "v")
    dist_shift = _get_dist_shift(model, shape[-1])
    if diff_obj in ("rectified_flow", "rf_denoiser") and sampler_type in (
        "dpmpp-3m-sde", "dpmpp-2m-sde",
    ):
        sampler_type = "euler"  # objective-appropriate default

    chunk_kwargs = _chunk_decode_kwargs(model, mesh)
    neg_struct = tuple(sorted(k for k, v in neg_inputs.items() if v is not None))
    key = (
        "inpaint", steps, sampler_type, float(sigma_min), float(sigma_max),
        float(rho), float(cfg_scale), float(scale_phi), tuple(cfg_interval),
        shape, bool(return_latents), diff_obj, neg_struct,
        tuple(sorted(sampler_kwargs.items())), bool(chunk_kwargs), bool(preview), mesh,
    )
    if preview:
        sampler_kwargs = dict(sampler_kwargs,
                              denoised_tap=get_preview_tap(model))
        getattr(model, "_preview_buffer").clear()

    def build(variables, noise, cond_tensors, neg, inpaint_cond, rng):
        def model_fn(x, t, **kw):
            return model.apply(
                variables, x, t,
                cond_tensors=cond_tensors,
                cfg_scale=cfg_scale,
                scale_phi=scale_phi,
                cfg_interval=tuple(cfg_interval),
                input_concat_cond=inpaint_cond,
                **neg,
                **kw,
            )

        sampler_rng = jax.random.fold_in(rng, 1)
        if diff_obj == "v":
            out = sample_k(
                model_fn, noise, steps=steps, sampler_type=sampler_type,
                sigma_min=sigma_min, sigma_max=sigma_max, rho=rho,
                rng=sampler_rng, **sampler_kwargs,
            )
        elif diff_obj in ("rectified_flow", "rf_denoiser"):
            out = sample_rf(
                model_fn, noise, steps=steps, sampler_type=sampler_type,
                sigma_max=min(sigma_max, 1.0), dist_shift=dist_shift,
                rng=sampler_rng, **sampler_kwargs,
            )
        else:
            raise ValueError(f"Unknown diffusion objective {diff_obj}")
        if not return_latents and model.pretransform is not None:
            out = model.apply(
                variables, out, method=model.pretransform_decode,
                rngs={"sample": jax.random.fold_in(rng, 98)},
                **chunk_kwargs,
            )
        return out

    fn = _jit_cache(model, key, build)
    neg_clean = {k: v for k, v in neg_inputs.items() if v is not None}
    return _call_with_mesh(fn, mesh, variables, noise, conditioning_tensors,
                           neg_clean, inpaint_cond, rng)
