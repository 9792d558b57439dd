"""ARC post-training: ODE warmup + relativistic GAN phases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.training.arc import ARCTrainer

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier

RF_DIT_CONFIG = {
    "model_type": "diffusion_cond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "conditioning": {
            "configs": [{"id": "prompt_num", "type": "number",
                         "config": {"min_val": 0, "max_val": 1}}],
            "cond_dim": 16,
        },
        "diffusion": {
            "cross_attention_cond_ids": ["prompt_num"],
            "type": "dit",
            "diffusion_objective": "rectified_flow",
            "config": {"io_channels": 2, "embed_dim": 16, "depth": 2,
                       "num_heads": 2, "cond_token_dim": 16,
                       "use_checkpointing": False},
        },
        "io_channels": 2,
    },
}


@pytest.fixture(scope="module")
def arc_setup():
    student = create_model_from_config(RF_DIT_CONFIG)
    disc = create_model_from_config(RF_DIT_CONFIG)
    mc = student._multi_conditioner
    meta = [{"prompt_num": 0.3}, {"prompt_num": 0.7}]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(meta))
    latents = jnp.asarray(np.random.RandomState(0).randn(2, 2, 32).astype(np.float32))
    t = jnp.ones((2,))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "cfg": jax.random.PRNGKey(2)}
    gen_vars = student.init(rngs, latents, t, cond=prepared)
    disc_vars = disc.init(rngs, latents, t, cond=prepared)

    trainer = ARCTrainer(
        model=student,
        discriminator=disc,
        arc_config={
            "ode_warmup": {"warmup_steps": 2, "refresh_rate": 2,
                           "n_sampling_steps": 4},
            "gan": {"discriminator_dit_layer": 0, "grad_penalties": True,
                    "contrastive": True},
        },
        optimizer_configs={
            "diffusion": {"optimizer": {"type": "Adam", "config": {"lr": 1e-4}}},
            "discriminator": {"optimizer": {"type": "Adam", "config": {"lr": 1e-4}}},
        },
    )
    cond_tensors = student.apply(gen_vars, prepared, method=student.run_conditioner)
    rolled_meta = [meta[1], meta[0]]
    rolled = student.apply(
        gen_vars, jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(rolled_meta)),
        method=student.run_conditioner,
    )
    state = trainer.init_state(gen_vars, disc_vars, latents)
    # train_step donates its state; hand out a host snapshot and let the
    # per-test fixture below restore fresh device buffers
    return trainer, jax.device_get(state), latents, cond_tensors, rolled


@pytest.fixture
def arc_fresh(arc_setup):
    trainer, host_state, latents, cond_tensors, rolled = arc_setup
    state = jax.tree_util.tree_map(jnp.asarray, host_state)
    return trainer, state, latents, cond_tensors, rolled


def test_arc_full_phase_cycle(arc_fresh):
    trainer, state, latents, cond, rolled = arc_fresh
    # steps 0-1: ODE warmup
    for step in range(2):
        state, aux = trainer.train_step(state, latents, cond,
                                        jax.random.PRNGKey(step), step)
        assert "ode_mse_loss" in aux
        assert np.isfinite(float(aux["loss"]))
    # step 2: generator adversarial
    state, aux = trainer.train_step(state, latents, cond, jax.random.PRNGKey(2), 2)
    assert "adv_loss" in aux
    assert np.isfinite(float(aux["loss"]))
    # step 3: discriminator with contrastive + grad penalties
    g0 = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
    state, aux = trainer.train_step(state, latents, cond, jax.random.PRNGKey(3), 3,
                                    rolled_cond_tensors=rolled)
    assert "loss_dis" in aux and "contrastive_loss_dis" in aux
    assert "grad_penalty_loss" in aux
    assert np.isfinite(float(aux["loss"]))
    # gen params untouched on disc step
    assert np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]), np.asarray(g0)
    )
    assert int(state.step) == 4

def test_arc_trim_buckets(arc_fresh):
    """Random-length trim: bucketed static shapes, applied only with prob>0."""
    trainer, state, latents, cond, rolled = arc_fresh
    trainer.trim_config = {"trim_prob": 1.0, "type": "random_item",
                           "bucket_multiple": 8}
    trainer.trim_prob, trainer.trim_type, trainer.trim_bucket = 1.0, "random_item", 8
    try:
        masks = np.zeros((2, 32), bool)
        masks[0, :17] = True   # data length 16
        masks[1, :25] = True   # data length 24
        trimmed = trainer._maybe_trim(latents, masks, step=12345)
        # rounded up to a multiple of 8, at least 128 → but T=32 caps it... use
        # the raw helper expectations: max(len,128) clamps to T=32 here
        assert trimmed.shape[-1] == 32  # min length floor (128) >= T → no trim

        big = jnp.zeros((2, 2, 512))
        masks = np.zeros((2, 512), bool)
        masks[:, :200] = True  # data length 199
        trimmed = trainer._maybe_trim(big, masks, step=7)
        # length 199 → rounded up to the next multiple of 8 = 200
        assert trimmed.shape[-1] == 200
        # full GAN step still runs on the trimmed shape
        state2, aux = trainer.train_step(state, latents, cond,
                                         jax.random.PRNGKey(9), 4,
                                         padding_masks=np.ones((2, 32), bool))
        assert np.isfinite(float(aux["loss"]))
    finally:
        trainer.trim_config = None
