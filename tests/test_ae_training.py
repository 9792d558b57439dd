"""Autoencoder GAN training: alternating gen/disc steps, losses finite+decreasing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config

AE_TRAIN_CONFIG = {
    "model_type": "autoencoder",
    "sample_size": 2048,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "encoder": {"type": "oobleck", "config": {
            "in_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
            "latent_dim": 8, "use_snake": True}},
        "decoder": {"type": "oobleck", "config": {
            "out_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
            "latent_dim": 4, "use_snake": True, "final_tanh": False}},
        "bottleneck": {"type": "vae"},
        "latent_dim": 4,
        "downsampling_ratio": 8,
        "io_channels": 2,
    },
    "training": {
        "learning_rate": 1e-3,
        "warmup_steps": 0,
        "use_ema": True,
        "loss_configs": {
            "discriminator": {
                "type": "encodec",
                "config": {"filters": 4, "n_ffts": [256, 128],
                           "hop_lengths": [64, 32], "win_lengths": [256, 128]},
                "weights": {"adversarial": 0.1, "feature_matching": 5.0},
            },
            "spectral": {
                "type": "mrstft",
                "config": {"fft_sizes": [256, 128], "hop_sizes": [64, 32],
                           "win_lengths": [256, 128], "perceptual_weighting": True},
                "weights": {"mrstft": 1.0},
            },
            "time": {"type": "l1", "config": {}, "weights": {"l1": 0.1}},
            "bottleneck": {"type": "kl", "weights": {"kl": 1e-4}},
        },
    },
}


@pytest.fixture(scope="module")
def _ae_trainer_cached():
    model = create_model_from_config(AE_TRAIN_CONFIG)
    trainer = create_training_wrapper_from_config(AE_TRAIN_CONFIG, model)
    audio = jnp.asarray(
        np.random.RandomState(0).randn(2, 2, 512).astype(np.float32) * 0.1
    )
    state = trainer.init_state(jax.random.PRNGKey(0), audio)
    # train_step donates its state; keep a host snapshot so every test gets
    # fresh device buffers
    return trainer, jax.device_get(state), audio


@pytest.fixture
def ae_trainer(_ae_trainer_cached):
    trainer, host_state, audio = _ae_trainer_cached
    state = jax.tree_util.tree_map(jnp.asarray, host_state)
    return trainer, state, audio


@pytest.mark.slow
def test_gan_alternation_and_losses(ae_trainer):
    trainer, state, audio = ae_trainer
    gen_losses = []
    for step in range(8):
        state, aux = trainer.train_step(state, audio, jax.random.PRNGKey(step), step)
        if step % 2 == 0:
            gen_losses.append(float(aux["loss"]))
            assert "mrstft_loss" in aux
            assert "kl_loss" in aux
            assert "loss_adv" in aux
        else:
            assert "discriminator_loss" in aux
        for v in aux.values():
            assert np.isfinite(float(v)), aux
    assert int(state.step) == 8
    # generator reconstruction should improve over a few steps
    assert gen_losses[-1] < gen_losses[0] * 1.5  # loose: GAN losses oscillate


@pytest.mark.slow
def test_disc_params_update_only_on_disc_steps(ae_trainer):
    trainer, state, audio = ae_trainer
    # snapshot to host before stepping: train_step donates its input state
    d0 = np.asarray(jax.tree_util.tree_leaves(state.disc_params)[0])
    g0 = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
    # even step: generator updates, discriminator untouched
    state1, _ = trainer.train_step(state, audio, jax.random.PRNGKey(0), 0)
    d1 = np.asarray(jax.tree_util.tree_leaves(state1.disc_params)[0])
    g1 = np.asarray(jax.tree_util.tree_leaves(state1.gen_params)[0])
    assert np.allclose(d1, d0)
    assert not np.allclose(g1, g0)
    # odd step: discriminator updates, generator untouched
    state2, _ = trainer.train_step(state1, audio, jax.random.PRNGKey(1), 1)
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.disc_params)[0]), d0
    )
    assert np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.gen_params)[0]), g1
    )


def test_export_params_uses_ema(ae_trainer):
    trainer, state, audio = ae_trainer
    for step in range(2):
        state, _ = trainer.train_step(state, audio, jax.random.PRNGKey(step), step)
    exported = trainer.export_params(state)
    assert jax.tree_util.tree_structure(exported) == jax.tree_util.tree_structure(
        state.gen_params
    )


@pytest.mark.slow
def test_ae_demo_callback_disc_sensitivity(ae_trainer, tmp_path):
    """AE demo callback logs recon/real + the discriminator-sensitivity
    spectrogram (reference training/autoencoders.py:597-611 probe)."""
    import glob

    from stable_audio_tools_tpu.training.demos import AutoencoderDemoCallback

    trainer, state, audio = ae_trainer
    model = trainer.autoencoder

    class OneBatchLoader:
        def __iter__(self):
            yield np.asarray(audio), [{} for _ in range(audio.shape[0])]

    cb = AutoencoderDemoCallback(
        AE_TRAIN_CONFIG, str(tmp_path), {"demo_every": 1}, OneBatchLoader()
    )
    cb(model, trainer, state, step=1)
    assert glob.glob(str(tmp_path / "recon_step1_*.wav"))
    assert glob.glob(str(tmp_path / "real_step1_*.wav"))
    assert (tmp_path / "disc_sensitivity_step1.png").exists()
