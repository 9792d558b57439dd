"""Checkpoint resume roundtrip + inpainting paths."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.io.checkpoints import load_checkpoint, save_checkpoint
from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.models.inpainting import random_inpaint_mask
from stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config

CFG = {
    "model_type": "diffusion_cond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "conditioning": {
            "configs": [{"id": "seconds_total", "type": "number",
                         "config": {"min_val": 0, "max_val": 512}}],
            "cond_dim": 16,
        },
        "diffusion": {
            "cross_attention_cond_ids": ["seconds_total"],
            "type": "dit",
            "config": {"io_channels": 2, "embed_dim": 16, "depth": 1,
                       "num_heads": 2, "cond_token_dim": 16,
                       "use_checkpointing": False},
        },
        "io_channels": 2,
    },
    "training": {"learning_rate": 1e-3},
}


@pytest.mark.slow
def test_train_checkpoint_resume_roundtrip(tmp_path):
    model = create_model_from_config(CFG)
    trainer = create_training_wrapper_from_config(CFG, model)
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(
        jnp.asarray, mc.gather_inputs([{"seconds_total": 10}])
    )
    x = jnp.zeros((1, 2, 64))
    t = jnp.ones((1,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "cfg": jax.random.PRNGKey(2)},
        x, t, cond=prepared, method=model.init_full,
    )
    state = trainer.init_state(variables)
    step_fn = jax.jit(trainer.make_train_step())
    batch = {"audio": jnp.asarray(np.random.RandomState(0).randn(1, 2, 64)
                                  .astype(np.float32)),
             "prepared_cond": prepared}
    for i in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(i))

    path = str(tmp_path / "state.ckpt")
    save_checkpoint(path, state, metadata={"step": 3})
    template = trainer.init_state(variables)
    restored = load_checkpoint(path, template)
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    # resumed training continues deterministically from the restored state
    s1, a1 = step_fn(state, batch, jax.random.PRNGKey(99))
    s2, a2 = step_fn(restored, batch, jax.random.PRNGKey(99))
    np.testing.assert_allclose(float(a1["loss"]), float(a2["loss"]), rtol=1e-6)


def test_random_inpaint_mask_types():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((8, 2, 64))
    pm = jnp.ones((8, 64))
    masked, mask = random_inpaint_mask(x, rng, padding_masks=pm)
    assert mask.shape == (8, 1, 64)
    m = np.asarray(mask)
    assert ((m == 0) | (m == 1)).all()
    # masked sequence zeroed where mask==0
    np.testing.assert_allclose(np.asarray(masked), np.asarray(x) * m)
    # with default probs [.1, .8, .1] most examples should be full-masked
    frac_full = np.mean([np.all(m[i] == 0) for i in range(8)])
    assert frac_full > 0.2


def test_generate_inpaint():
    from stable_audio_tools_tpu.inference.generation import (
        build_mask,
        generate_diffusion_cond_inpaint,
    )

    inpaint_cfg = {**CFG, "model_type": "diffusion_cond_inpaint"}
    inpaint_cfg["model"] = dict(CFG["model"])
    inpaint_cfg["model"]["diffusion"] = {
        **CFG["model"]["diffusion"],
        "input_concat_ids": [],
        "config": {**CFG["model"]["diffusion"]["config"], "input_concat_dim": 3},
    }
    model = create_model_from_config(inpaint_cfg)
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(
        jnp.asarray, mc.gather_inputs([{"seconds_total": 10}])
    )
    x = jnp.zeros((1, 2, 64))
    t = jnp.ones((1,))
    cat = jnp.zeros((1, 3, 64))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "cfg": jax.random.PRNGKey(2)},
        x, t, cond=prepared, input_concat_cond=cat, method=model.init_full,
    )
    init_audio = (16000, np.random.RandomState(1).randn(2, 256).astype(np.float32))
    out = generate_diffusion_cond_inpaint(
        model, variables, steps=2, cfg_scale=1.0,
        conditioning=[{"seconds_total": 10}],
        sample_size=64, seed=0, init_audio=init_audio,
        mask_args={"maskstart": 16, "maskend": 48, "softnessL": 0.1,
                   "softnessR": 0.1},
        sampler_type="dpmpp-2m", return_latents=True,
    )
    assert out.shape == (1, 2, 64)
    assert np.all(np.isfinite(np.asarray(out)))

    m = np.asarray(build_mask(64, {"maskstart": 16, "maskend": 48}))
    assert m[0] == 1 and m[20] == 0 and m[-1] == 1


def test_generate_inpaint_rectified_flow():
    """Inpainting must dispatch on diffusion_objective (regression: RF
    models previously ran through the v-objective k-diffusion wrapper)."""
    from stable_audio_tools_tpu.inference.generation import (
        generate_diffusion_cond_inpaint,
    )

    inpaint_cfg = {**CFG, "model_type": "diffusion_cond_inpaint"}
    inpaint_cfg["model"] = dict(CFG["model"])
    inpaint_cfg["model"]["diffusion"] = {
        **CFG["model"]["diffusion"],
        "diffusion_objective": "rectified_flow",
        "input_concat_ids": [],
        "config": {**CFG["model"]["diffusion"]["config"], "input_concat_dim": 3},
    }
    model = create_model_from_config(inpaint_cfg)
    assert model.diffusion_objective == "rectified_flow"
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(
        jnp.asarray, mc.gather_inputs([{"seconds_total": 10}])
    )
    x = jnp.zeros((1, 2, 64))
    t = jnp.ones((1,))
    cat = jnp.zeros((1, 3, 64))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "cfg": jax.random.PRNGKey(2)},
        x, t, cond=prepared, input_concat_cond=cat, method=model.init_full,
    )
    init_audio = (16000, np.random.RandomState(1).randn(2, 256).astype(np.float32))
    # default sampler_type dpmpp-3m-sde must be remapped for RF, like
    # generate_diffusion_cond does
    out = generate_diffusion_cond_inpaint(
        model, variables, steps=2, cfg_scale=1.0,
        conditioning=[{"seconds_total": 10}],
        sample_size=64, seed=0, init_audio=init_audio,
        mask_args={"maskstart": 16, "maskend": 48, "softnessL": 0.1,
                   "softnessR": 0.1},
        return_latents=True,
    )
    assert out.shape == (1, 2, 64)
    assert np.all(np.isfinite(np.asarray(out)))
