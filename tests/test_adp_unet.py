"""ADP UNet (SA-1.0 backbone) tests: UNet1d/UNetCFG1d through the factory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.adp import UNet1d, UNetCFG1d
from stable_audio_tools_tpu.models.factory import create_model_from_config

SA1_STYLE_CONFIG = {
    "model_type": "diffusion_cond",
    "sample_size": 1024,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "conditioning": {
            "configs": [
                {"id": "prompt_emb", "type": "number",
                 "config": {"min_val": 0, "max_val": 1}},
                {"id": "seconds_start", "type": "number",
                 "config": {"min_val": 0, "max_val": 512}},
            ],
            "cond_dim": 24,
        },
        "diffusion": {
            "type": "adp_cfg_1d",
            "cross_attention_cond_ids": ["prompt_emb", "seconds_start"],
            "config": {
                "in_channels": 4,
                "context_embedding_features": 24,
                "context_embedding_max_length": 8,
                "channels": 8,
                "resnet_groups": 4,
                "kernel_multiplier_downsample": 2,
                "multipliers": [2, 3, 4],
                "factors": [2, 2],
                "num_blocks": [1, 1],
                "attentions": [0, 1, 1],
                "attention_heads": 4,
                "attention_multiplier": 2,
                "use_nearest_upsample": False,
                "use_skip_scale": True,
                "use_context_time": True,
            },
        },
        "io_channels": 4,
    },
}


def test_unet1d_shapes():
    unet = UNet1d(
        in_channels=4, channels=8, multipliers=(2, 3, 4), factors=(2, 2),
        num_blocks=(1, 1), attentions=(0, 1, 1), resnet_groups=4,
        attention_heads=4, attention_multiplier=2,
        context_embedding_features=24,
    )
    x = jnp.zeros((2, 4, 64))
    t = jnp.ones((2,))
    emb = jnp.zeros((2, 8, 24))
    v = unet.init(jax.random.PRNGKey(0), x, t, embedding=emb)
    out = unet.apply(v, x, t, embedding=emb)
    assert out.shape == x.shape


def test_unetcfg1d_cfg_paths():
    unet = UNetCFG1d(
        in_channels=4, channels=8, multipliers=(2, 3, 4), factors=(2, 2),
        num_blocks=(1, 1), attentions=(0, 1, 1), resnet_groups=4,
        attention_heads=4, attention_multiplier=2,
        context_embedding_features=24, context_embedding_max_length=8,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 64).astype(np.float32))
    t = jnp.full((1,), 0.5)
    emb = jnp.asarray(np.random.RandomState(1).randn(1, 6, 24).astype(np.float32))
    v = unet.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        x, t, embedding=emb,
    )
    out_plain = unet.apply(v, x, t, embedding=emb)
    assert out_plain.shape == x.shape
    out_cfg = unet.apply(v, x, t, embedding=emb, embedding_scale=3.0)
    assert out_cfg.shape == x.shape
    out_rescale = unet.apply(v, x, t, embedding=emb, embedding_scale=3.0,
                             rescale_cfg=True, scale_phi=0.4)
    assert np.all(np.isfinite(np.asarray(out_rescale)))
    # CFG must change the output
    assert not np.allclose(np.asarray(out_plain), np.asarray(out_cfg))


def test_adp_cfg_through_factory_and_generate():
    from stable_audio_tools_tpu.inference.generation import generate_diffusion_cond

    model = create_model_from_config(SA1_STYLE_CONFIG)
    mc = model._multi_conditioner
    cond = [{"prompt_emb": 0.5, "seconds_start": 10}]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(cond))
    x = jnp.zeros((1, 4, 64))
    t = jnp.ones((1,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "cfg": jax.random.PRNGKey(2)},
        x, t, cond=prepared, method=model.init_full,
    )
    out = model.apply(variables, x, t, cond=prepared, cfg_scale=2.0)
    assert out.shape == x.shape

    audio = generate_diffusion_cond(
        model, variables, steps=2, cfg_scale=2.0, conditioning=cond,
        sample_size=64, seed=0, sampler_type="dpmpp-2m",
    )
    assert audio.shape == (1, 4, 64)
    assert np.all(np.isfinite(np.asarray(audio)))
