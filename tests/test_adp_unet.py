"""ADP UNet (SA-1.0 backbone) tests: UNet1d/UNetCFG1d through the factory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.adp import UNet1d, UNetCFG1d
from stable_audio_tools_tpu.models.factory import create_model_from_config

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier

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


def test_unet_ncca_1d():
    """Noise-channel conditioning augmentation (reference adp.py:1385-1432)."""
    from stable_audio_tools_tpu.models.adp import UNetNCCA1d

    unet = UNetNCCA1d(
        in_channels=4, channels=8, multipliers=(2, 3, 4), factors=(2, 2),
        num_blocks=(1, 1), attentions=(0, 0, 0), resnet_groups=4,
        context_features=16, context_channels=(4,),
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 64).astype(np.float32))
    t = jnp.full((2,), 0.5)
    chans = [jnp.asarray(np.random.RandomState(1).randn(2, 4, 64).astype(np.float32))]
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    v = unet.init(rngs, x, t, channels_list=chans)
    # embedder params exist (NumberEmbedder over the scales)
    assert "embedder" in v["params"]
    out = unet.apply(v, x, t, channels_list=chans,
                     rngs={"sample": jax.random.PRNGKey(2)})
    assert out.shape == x.shape
    # scale=0 (no augmentation) is deterministic; scale=1 + augmentation on
    # injects noise, so two rng draws differ
    a = unet.apply(v, x, t, channels_list=chans, channels_augmentation=True,
                   channels_scale=1.0, rngs={"sample": jax.random.PRNGKey(3)})
    b = unet.apply(v, x, t, channels_list=chans, channels_augmentation=True,
                   channels_scale=1.0, rngs={"sample": jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    c = unet.apply(v, x, t, channels_list=chans, channels_augmentation=True,
                   channels_scale=0.0, rngs={"sample": jax.random.PRNGKey(5)})
    d = unet.apply(v, x, t, channels_list=chans, channels_augmentation=True,
                   channels_scale=0.0, rngs={"sample": jax.random.PRNGKey(6)})
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))
    # channels_scale feeds the features mapping: different scale, different out
    e = unet.apply(v, x, t, channels_list=chans, channels_augmentation=False,
                   channels_scale=0.7, rngs={"sample": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(c), np.asarray(e))


def test_unet_all_1d_cfg_plus_ncca():
    """UNetAll1d = CFG over NCCA (reference adp.py:1434-1441)."""
    from stable_audio_tools_tpu.models.adp import UNetAll1d, UNetCFG1d, XUNet1d

    unet = UNetAll1d(
        in_channels=4, channels=8, multipliers=(2, 3, 4), factors=(2, 2),
        num_blocks=(1, 1), attentions=(0, 1, 1), resnet_groups=4,
        attention_heads=4, context_features=16, context_channels=(4,),
        context_embedding_features=24, context_embedding_max_length=8,
    )
    assert isinstance(unet, UNetCFG1d) and unet.use_ncca
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 64).astype(np.float32))
    t = jnp.full((1,), 0.5)
    emb = jnp.asarray(np.random.RandomState(1).randn(1, 6, 24).astype(np.float32))
    chans = [jnp.asarray(np.random.RandomState(2).randn(1, 4, 64).astype(np.float32))]
    rngs = {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1),
            "sample": jax.random.PRNGKey(2)}
    v = unet.init(rngs, x, t, embedding=emb, channels_list=chans)
    out = unet.apply(v, x, t, embedding=emb, channels_list=chans,
                     embedding_scale=3.0, channels_augmentation=True,
                     channels_scale=0.5, rngs={"sample": jax.random.PRNGKey(3)})
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
    # XUNet1d dispatch (reference adp.py:1443-1453)
    assert isinstance(XUNet1d(type="cfg", in_channels=4, channels=8,
                              multipliers=(2, 3), factors=(2,), num_blocks=(1,),
                              attentions=(0, 0),
                              context_embedding_features=24), UNetCFG1d)
    with pytest.raises(ValueError):
        XUNet1d(type="nope")


ADP_UNCOND_CONFIG = {
    "model_type": "diffusion_uncond",
    "sample_size": 512,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "type": "adp_uncond_1d",
        "config": {
            "in_channels": 2,
            "channels": 8,
            "resnet_groups": 4,
            "multipliers": [2, 3, 4],
            "factors": [2, 2],
            "num_blocks": [1, 1],
            "attentions": [0, 0, 1],
            "attention_heads": 4,
            "attention_multiplier": 2,
        },
    },
    "training": {"learning_rate": 1e-3},
}


def test_adp_uncond_1d_factory_train_and_sample():
    """Reference diffusion.py:608-613: adp_uncond_1d builds, trains, samples."""
    from stable_audio_tools_tpu.inference.generation import generate_diffusion_uncond
    from stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config,
    )

    model = create_model_from_config(ADP_UNCOND_CONFIG)
    assert model.io_channels == 2
    assert model.min_input_length == 4
    x = jnp.zeros((2, 2, 128))
    t = jnp.ones((2,))
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == x.shape

    trainer = create_training_wrapper_from_config(ADP_UNCOND_CONFIG, model)
    state = trainer.init_state(variables)
    train_step = jax.jit(trainer.make_train_step())
    batch = {
        "audio": jnp.asarray(
            np.random.RandomState(0).randn(2, 2, 128).astype(np.float32) * 0.1
        ),
        "padding_mask": jnp.ones((2, 128), dtype=bool),
    }
    state, aux = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert state.step == 1

    audio = generate_diffusion_uncond(
        model, variables, steps=3, batch_size=1, sample_size=128,
        seed=7, sampler_type="dpmpp-2m", sigma_min=0.3, sigma_max=50.0,
    )
    assert audio.shape == (1, 2, 128)
    assert np.all(np.isfinite(np.asarray(audio)))


def test_use_stft_context_spectral_channels():
    """use_stft_context=True spectral-encodes the layer-0 context channels
    (reference adp.py:1169): the UNet consumes [B, ctx*2*bins, frames] at
    layer 0 and still round-trips to the waveform length."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stable_audio_tools_tpu.models.adp import UNet1d

    m = UNet1d(
        in_channels=2, channels=16, multipliers=(1, 2), factors=(2,),
        num_blocks=(1,), attentions=(0, 0), resnet_groups=2,
        use_context_time=True, context_channels=(1,),
        use_stft=True, use_stft_context=True, stft_num_fft=16,
        stft_hop_length=8,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 120), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 1, 120), jnp.float32)
    t = jnp.array([0.5], jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, t, channels_list=[ctx])["params"]
    out = m.apply({"params": params}, x, t, channels_list=[ctx])
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # the context genuinely enters: different ctx -> different output
    out2 = m.apply({"params": params}, x, t, channels_list=[2.0 * ctx])
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-6
