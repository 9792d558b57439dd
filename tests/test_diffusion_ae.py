"""Diffusion autoencoder: factory, encode/decode, training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier

DIFFAE_CONFIG = {
    "model_type": "diffusion_autoencoder",
    "sample_size": 512,
    "sample_rate": 16000,
    "audio_channels": 1,
    "model": {
        "encoder": {"type": "oobleck", "config": {
            "in_channels": 1, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
            "latent_dim": 8, "use_snake": True}},
        "diffusion": {
            "type": "DAU1d",
            "config": {"io_channels": 1, "depth": 2, "n_attn_layers": 0,
                       "channels": [8, 8], "strides": [2], "cond_dim": 4},
        },
        "bottleneck": {"type": "vae"},
        "latent_dim": 4,
        "downsampling_ratio": 8,
        "io_channels": 1,
    },
    "training": {"learning_rate": 1e-3},
}


@pytest.fixture(scope="module")
def diffae():
    model = create_model_from_config(DIFFAE_CONFIG)
    audio = jnp.asarray(
        np.random.RandomState(0).randn(2, 1, 256).astype(np.float32) * 0.1
    )
    t = jnp.ones((2,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        audio, t,
    )
    return model, variables, audio


def test_diffae_encode_decode(diffae):
    model, variables, audio = diffae
    latents = model.apply(
        variables, audio, rngs={"sample": jax.random.PRNGKey(2)},
        method=model.encode,
    )
    assert latents.shape == (2, 4, 32)
    decoded = model.apply(
        variables, latents, steps=3,
        rngs={"sample": jax.random.PRNGKey(3)}, method=model.decode,
    )
    assert decoded.shape == (2, 1, 256)
    assert np.all(np.isfinite(np.asarray(decoded)))


def test_diffae_training_step(diffae):
    model, variables, audio = diffae
    trainer = create_training_wrapper_from_config(DIFFAE_CONFIG, model)
    state = trainer.init_state(variables)
    step = jax.jit(trainer.make_train_step())
    batch = {"audio": audio}
    losses = []
    for i in range(6):
        state, aux = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
        assert np.isfinite(losses[-1])
    assert "kl_loss" in aux
    assert losses[-1] < losses[0] * 1.2
