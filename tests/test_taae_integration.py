"""TAAE autoencoder + SA-Open-mini (T5+VAE+DiT) integration tests."""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.factory import create_model_from_config

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier


def test_taae_autoencoder_roundtrip():
    cfg = {
        "model_type": "autoencoder",
        "sample_size": 2048,
        "sample_rate": 16000,
        "audio_channels": 1,
        "model": {
            "encoder": {"type": "taae", "config": {
                "in_channels": 1, "channels": 8, "c_mults": [1, 2],
                "strides": [4, 4], "latent_dim": 8,
                "transformer_depths": [1, 1], "sliding_window": [7, 8]}},
            "decoder": {"type": "taae", "config": {
                "out_channels": 1, "channels": 8, "c_mults": [1, 2],
                "strides": [4, 4], "latent_dim": 4,
                "transformer_depths": [1, 1], "sliding_window": [7, 8]}},
            "bottleneck": {"type": "vae"},
            "latent_dim": 4, "downsampling_ratio": 16, "io_channels": 1,
        },
    }
    model = create_model_from_config(cfg)
    audio = jnp.asarray(
        np.random.RandomState(0).randn(1, 1, 512).astype(np.float32) * 0.1
    )
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, audio)
    recon, info = model.apply(variables, audio,
                              rngs={"sample": jax.random.PRNGKey(2)})
    assert recon.shape == audio.shape
    assert np.all(np.isfinite(np.asarray(recon)))


def test_sa_open_mini_text_to_audio():
    """T5 conditioner (offline fallback) + VAE pretransform + DiT generate."""
    from stable_audio_tools_tpu.inference.generation import generate_diffusion_cond

    cfg = {
        "model_type": "diffusion_cond",
        "sample_size": 2048,
        "sample_rate": 16000,
        "audio_channels": 2,
        "model": {
            "pretransform": {
                "type": "autoencoder",
                "config": {
                    "encoder": {"type": "oobleck", "config": {
                        "in_channels": 2, "channels": 8, "c_mults": [1, 2],
                        "strides": [4, 8], "latent_dim": 8, "use_snake": True}},
                    "decoder": {"type": "oobleck", "config": {
                        "out_channels": 2, "channels": 8, "c_mults": [1, 2],
                        "strides": [4, 8], "latent_dim": 4, "use_snake": True}},
                    "bottleneck": {"type": "vae"},
                    "latent_dim": 4, "downsampling_ratio": 32, "io_channels": 2,
                },
            },
            "conditioning": {
                "configs": [
                    {"id": "prompt", "type": "t5",
                     "config": {"t5_model_name": "t5-base", "max_length": 8,
                                "allow_random_init": True}},
                    {"id": "seconds_total", "type": "number",
                     "config": {"min_val": 0, "max_val": 64}},
                ],
                "cond_dim": 32,
            },
            "diffusion": {
                "cross_attention_cond_ids": ["prompt", "seconds_total"],
                "global_cond_ids": ["seconds_total"],
                "type": "dit",
                "diffusion_objective": "v",
                "config": {"io_channels": 4, "embed_dim": 32, "depth": 1,
                           "num_heads": 2, "cond_token_dim": 32,
                           "global_cond_dim": 32, "use_checkpointing": False},
            },
            "io_channels": 4,
        },
    }
    model = create_model_from_config(cfg)
    mc = model._multi_conditioner
    conditioning = [{"prompt": "warm synth pad", "seconds_total": 10}]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(conditioning))
    x = jnp.zeros((1, 4, 64))
    t = jnp.ones((1,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "cfg": jax.random.PRNGKey(2)},
        x, t, cond=prepared, method=model.init_full,
    )
    audio = generate_diffusion_cond(
        model, variables, steps=3, cfg_scale=3.0, conditioning=conditioning,
        negative_conditioning=[{"prompt": "noise", "seconds_total": 10}],
        sample_size=2048, seed=11, sampler_type="dpmpp-3m-sde",
        sigma_min=0.3, sigma_max=100.0,
    )
    assert audio.shape == (1, 2, 2048)
    assert np.all(np.isfinite(np.asarray(audio)))
