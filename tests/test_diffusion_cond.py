"""End-to-end conditioned diffusion: config → model → conditioning → generate."""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.inference.generation import (
    compute_conditioning_tensors,
    generate_diffusion_cond,
    generate_diffusion_uncond,
)

TINY_DIT_CONFIG = {
    "model_type": "diffusion_cond",
    "sample_size": 1024,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "pretransform": {
            "type": "autoencoder",
            "config": {
                "encoder": {
                    "type": "oobleck",
                    "config": {
                        "in_channels": 2, "channels": 8, "c_mults": [1, 2],
                        "strides": [4, 4], "latent_dim": 8, "use_snake": True,
                    },
                },
                "decoder": {
                    "type": "oobleck",
                    "config": {
                        "out_channels": 2, "channels": 8, "c_mults": [1, 2],
                        "strides": [4, 4], "latent_dim": 4, "use_snake": True,
                    },
                },
                "bottleneck": {"type": "vae"},
                "latent_dim": 4,
                "downsampling_ratio": 16,
                "io_channels": 2,
            },
        },
        "conditioning": {
            "configs": [
                {
                    "id": "seconds_start",
                    "type": "number",
                    "config": {"min_val": 0, "max_val": 512},
                },
                {
                    "id": "seconds_total",
                    "type": "number",
                    "config": {"min_val": 0, "max_val": 512},
                },
            ],
            "cond_dim": 32,
        },
        "diffusion": {
            "cross_attention_cond_ids": ["seconds_start", "seconds_total"],
            "global_cond_ids": ["seconds_total"],
            "type": "dit",
            "diffusion_objective": "v",
            "config": {
                "io_channels": 4,
                "embed_dim": 32,
                "depth": 2,
                "num_heads": 4,
                "cond_token_dim": 32,
                "global_cond_dim": 32,
                "project_cond_tokens": True,
                "use_checkpointing": False,
            },
        },
        "io_channels": 4,
    },
}

CONDITIONING = [{"seconds_start": 0, "seconds_total": 30}]


@pytest.fixture(scope="module")
def cond_model():
    model = create_model_from_config(TINY_DIT_CONFIG)
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(
        jnp.asarray, mc.gather_inputs(CONDITIONING)
    )
    x = jnp.zeros((1, 4, 64))
    t = jnp.ones((1,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, t, cond=prepared, method=model.init_full,
    )
    return model, variables


@pytest.mark.slow
def test_cond_model_forward_with_cfg(cond_model):
    model, variables = cond_model
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(CONDITIONING))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 64).astype(np.float32))
    t = jnp.full((1,), 0.5)
    out = model.apply(variables, x, t, cond=prepared)
    assert out.shape == x.shape
    out_cfg = model.apply(variables, x, t, cond=prepared, cfg_scale=3.0)
    assert out_cfg.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out_cfg)))


@pytest.mark.slow
def test_cfg_interval_compute_split(cond_model):
    """cfg_interval uses lax.cond: inside → full CFG, outside → cond-only."""
    model, variables = cond_model
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(CONDITIONING))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 64).astype(np.float32))

    # perturb params: branch outputs are zero-init, so at init the output is
    # (correctly) independent of conditioning and CFG would be a no-op
    leaves, tree = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    variables = jax.tree_util.tree_unflatten(tree, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)
    ])

    def run(t_val, **kw):
        return np.asarray(model.apply(
            variables, x, jnp.full((1,), t_val), cond=prepared, **kw
        ))

    interval = (0.2, 0.8)
    # inside the interval (v-objective: sigma = sin(t*pi/2); t=0.5 → σ≈0.707)
    inside = run(0.5, cfg_scale=3.0, cfg_interval=interval)
    full_cfg = run(0.5, cfg_scale=3.0)
    np.testing.assert_allclose(inside, full_cfg, rtol=1e-5, atol=1e-6)
    # outside (t=0.05 → σ≈0.078 < 0.2) falls back to the cond-only forward
    outside = run(0.05, cfg_scale=3.0, cfg_interval=interval)
    cond_only = run(0.05, cfg_scale=1.0)
    np.testing.assert_allclose(outside, cond_only, rtol=1e-5, atol=1e-6)
    assert not np.allclose(outside, run(0.05, cfg_scale=3.0))


def test_conditioning_tensors_shapes(cond_model):
    model, variables = cond_model
    tensors = compute_conditioning_tensors(model, variables, CONDITIONING)
    assert set(tensors.keys()) == {"seconds_start", "seconds_total"}
    cond, mask = tensors["seconds_start"]
    assert cond.shape == (1, 1, 32)
    inputs = model.get_conditioning_inputs(tensors)
    assert inputs["cross_attn_cond"].shape == (1, 2, 32)
    assert inputs["global_cond"].shape == (1, 32)


@pytest.mark.slow
def test_generate_diffusion_cond_end_to_end(cond_model):
    model, variables = cond_model
    audio = generate_diffusion_cond(
        model, variables,
        steps=4,
        cfg_scale=2.0,
        conditioning=CONDITIONING,
        batch_size=1,
        sample_size=1024,
        seed=42,
        sampler_type="dpmpp-2m",
        sigma_min=0.3,
        sigma_max=100.0,
    )
    assert audio.shape == (1, 2, 1024)
    assert np.all(np.isfinite(np.asarray(audio)))

    latents = generate_diffusion_cond(
        model, variables, steps=2, conditioning=CONDITIONING,
        sample_size=1024, seed=1, return_latents=True, sampler_type="euler"
        if model.diffusion_objective != "v" else "dpmpp-2m",
        cfg_scale=1.0,
    )
    assert latents.shape == (1, 4, 64)


def test_generate_with_negative_conditioning(cond_model):
    model, variables = cond_model
    audio = generate_diffusion_cond(
        model, variables, steps=2, cfg_scale=2.0,
        conditioning=CONDITIONING,
        negative_conditioning=[{"seconds_start": 5, "seconds_total": 10}],
        sample_size=1024, seed=3, sampler_type="dpmpp-2m",
    )
    assert audio.shape == (1, 2, 1024)


TINY_UNCOND_CONFIG = {
    "model_type": "diffusion_uncond",
    "sample_size": 512,
    "sample_rate": 16000,
    "audio_channels": 1,
    "model": {
        "type": "DAU1d",
        "config": {
            "io_channels": 1,
            "depth": 3,
            "n_attn_layers": 1,
            "channels": [8, 8, 16],
            "strides": [2, 2],
        },
    },
}


@pytest.mark.slow
def test_generate_diffusion_uncond_dau1d():
    model = create_model_from_config(TINY_UNCOND_CONFIG)
    x = jnp.zeros((1, 1, 128))
    t = jnp.ones((1,))
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == x.shape

    audio = generate_diffusion_uncond(
        model, variables, steps=3, batch_size=1, sample_size=128,
        seed=7, sampler_type="dpmpp-2m", sigma_min=0.3, sigma_max=50.0,
    )
    assert audio.shape == (1, 1, 128)
    assert np.all(np.isfinite(np.asarray(audio)))


@pytest.mark.slow
def test_generate_cond_on_mesh_matches_single_device(cond_model):
    """Multi-chip generation (TP params + DP batch over a virtual mesh) must
    produce the same audio as single-device generation."""
    from stable_audio_tools_tpu.parallel.mesh import create_mesh

    model, variables = cond_model
    kwargs = dict(
        steps=4, cfg_scale=3.0, conditioning=CONDITIONING * 2, batch_size=2,
        sample_size=1024, seed=42, sampler_type="dpmpp-2m", cfg_interval=(0.1, 0.9),
    )
    ref = np.asarray(generate_diffusion_cond(model, variables, **kwargs))

    mesh = create_mesh(data=2, model=4)
    got = np.asarray(generate_diffusion_cond(
        model, variables, mesh=mesh, **kwargs
    ))
    assert got.shape == ref.shape == (2, 2, 1024)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
