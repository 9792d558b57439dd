"""Interface-layer tests: local attention, aeiou viz, demo callbacks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.interface.aeiou import (
    audio_spectrogram_image,
    pca_point_cloud,
    tokens_spectrogram_image,
)
from stable_audio_tools_tpu.models.local_attention import (
    TransformerDecoder1D,
    TransformerEncoder1D,
)


def test_local_attention_encoder_decoder():
    enc = TransformerEncoder1D(
        in_channels=4, out_channels=8, embed_dims=(16, 32),
        heads=(2, 2), depths=(1, 1), ratios=(2, 2), local_attn_window_size=8,
    )
    x = jnp.zeros((1, 32, 4))  # NLC
    v = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(v, x)
    assert z.shape == (1, 8, 8)

    dec = TransformerDecoder1D(
        in_channels=8, out_channels=4, embed_dims=(32, 16),
        heads=(2, 2), depths=(1, 1), ratios=(2, 2), local_attn_window_size=8,
    )
    vd = dec.init(jax.random.PRNGKey(0), z)
    y = dec.apply(vd, z)
    assert y.shape == (1, 32, 4)


def test_aeiou_visualizations():
    import matplotlib

    matplotlib.use("Agg")
    audio = np.random.RandomState(0).randn(2, 4096).astype(np.float32) * 0.1
    img = audio_spectrogram_image(audio, 16000)
    assert img.ndim == 3 and img.shape[-1] == 3

    latents = np.random.RandomState(1).randn(1, 8, 64).astype(np.float32)
    img2 = tokens_spectrogram_image(latents)
    assert img2.ndim == 3

    img3 = pca_point_cloud(latents)
    assert img3.ndim == 3


def test_demo_callback_uncond(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.training.demos import (
        create_demo_callback_from_config,
    )
    from stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config,
    )

    cfg = {
        "model_type": "diffusion_uncond",
        "sample_size": 128,
        "sample_rate": 16000,
        "audio_channels": 1,
        "model": {"type": "DAU1d", "config": {
            "io_channels": 1, "depth": 2, "n_attn_layers": 0,
            "channels": [4, 8], "strides": [2]}},
        "training": {"learning_rate": 1e-4,
                     "demo": {"demo_every": 1, "demo_steps": 2, "num_demos": 1}},
    }
    model = create_model_from_config(cfg)
    wrapper = create_training_wrapper_from_config(cfg, model)
    x = jnp.zeros((1, 1, 128))
    t = jnp.ones((1,))
    variables = model.init(jax.random.PRNGKey(0), x, t)
    state = wrapper.init_state(variables)
    cb = create_demo_callback_from_config(cfg, demo_dir=str(tmp_path))
    cb(model, wrapper, state, step=1)
    files = os.listdir(tmp_path)
    assert any(f.endswith(".wav") for f in files), files
