"""Training-step tests: loss decreases, EMA updates, DP mesh + ZeRO sharding."""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config
from stable_audio_tools_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    zero_shard_opt_state,
    replicate_tree,
)

TRAIN_CONFIG = {
    "model_type": "diffusion_cond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "conditioning": {
            "configs": [
                {"id": "seconds_total", "type": "number",
                 "config": {"min_val": 0, "max_val": 512}},
            ],
            "cond_dim": 16,
        },
        "diffusion": {
            "cross_attention_cond_ids": ["seconds_total"],
            "type": "dit",
            "diffusion_objective": "v",
            "config": {
                "io_channels": 2,
                "embed_dim": 16,
                "depth": 1,
                "num_heads": 2,
                "cond_token_dim": 16,
                "use_checkpointing": False,
            },
        },
        "io_channels": 2,
    },
    "training": {
        "learning_rate": 1e-3,
        "timestep_sampler": "logit_normal",
        "cfg_dropout_prob": 0.1,
        "mask_padding": True,
    },
}

CONDITIONING = [{"seconds_total": 10.0}, {"seconds_total": 20.0}]


@pytest.fixture(scope="module")
def trainer_setup():
    model = create_model_from_config(TRAIN_CONFIG)
    trainer = create_training_wrapper_from_config(TRAIN_CONFIG, model)
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(CONDITIONING))
    x = jnp.zeros((2, 2, 64))
    t = jnp.ones((2,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "cfg": jax.random.PRNGKey(2)},
        x, t, cond=prepared, method=model.init_full,
    )
    return model, trainer, variables, prepared


def _batch(prepared, B=2, T=64):
    audio = np.random.RandomState(0).randn(B, 2, T).astype(np.float32) * 0.1
    return {
        "audio": jnp.asarray(audio),
        "prepared_cond": prepared,
        "padding_mask": jnp.ones((B, T), dtype=bool),
    }


def test_train_step_decreases_loss(trainer_setup):
    model, trainer, variables, prepared = trainer_setup
    state = trainer.init_state(variables)
    train_step = jax.jit(trainer.make_train_step())
    batch = _batch(prepared)
    losses = []
    for i in range(12):
        state, aux = train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
    assert state.step == 12
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


def test_ema_params_track_params(trainer_setup):
    model, trainer, variables, prepared = trainer_setup
    state = trainer.init_state(variables)
    train_step = jax.jit(trainer.make_train_step())
    batch = _batch(prepared)
    for i in range(3):
        state, _ = train_step(state, batch, jax.random.PRNGKey(i))
    # EMA should differ from both init and current params but stay close
    p0 = jax.tree_util.tree_leaves(variables["params"])[0]
    pe = jax.tree_util.tree_leaves(state.ema_params)[0]
    pc = jax.tree_util.tree_leaves(state.params)[0]
    assert pe.shape == pc.shape
    assert np.all(np.isfinite(np.asarray(pe)))


@pytest.mark.slow
def test_gradient_accumulation(trainer_setup):
    model, trainer, variables, prepared = trainer_setup
    state = trainer.init_state(variables)
    step_acc = jax.jit(trainer.make_train_step(accum_steps=2))
    batch = _batch(prepared, B=4)
    state, aux = step_acc(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))


def test_validation_step(trainer_setup):
    model, trainer, variables, prepared = trainer_setup
    state = trainer.init_state(variables)
    val_step = jax.jit(trainer.make_val_step())
    out = val_step(state, _batch(prepared), jax.random.PRNGKey(0))
    assert set(out.keys()) == {f"val/loss_{t:.1f}" for t in (0.1, 0.3, 0.5, 0.7, 0.9)}
    for v in out.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_dp_mesh_training_with_zero_sharding(trainer_setup):
    """DP over 8 virtual devices with ZeRO-sharded optimizer state."""
    model, trainer, variables, prepared = trainer_setup
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    mesh = create_mesh(data=8, model=1)

    state = trainer.init_state(variables)
    # params + ema replicated; opt_state ZeRO-sharded over 'data'
    state = state.replace(
        params=replicate_tree(state.params, mesh),
        ema_params=replicate_tree(state.ema_params, mesh),
        opt_state=jax.device_put(
            state.opt_state, zero_shard_opt_state(state.opt_state, mesh)
        ),
    )
    B = 8
    prepared8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), prepared
    )
    batch = _batch(prepared8, B=B)
    batch = shard_batch(batch, mesh)

    train_step = jax.jit(trainer.make_train_step())
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        state, aux = train_step(state, batch, jax.random.PRNGKey(0))
        state, aux = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    # check opt state stayed sharded
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    arr = next(l for l in leaves if hasattr(l, "sharding") and l.ndim >= 1)
    assert not arr.sharding.is_fully_replicated or arr.shape[0] % 8 != 0


def test_sobol_timesteps_low_discrepancy():
    """Uncond trainer draws Sobol (van der Corput) timesteps continued across
    steps (reference training/diffusion.py:60,96 SobolEngine): the first 8
    values are the exact base-2 radical inverse sequence, and 256 consecutive
    draws stratify [0,1) to a 1/256 max gap."""
    import numpy as np
    from stable_audio_tools_tpu.training.diffusion import (
        _sample_timesteps, _sobol_timesteps,
    )

    t0 = np.asarray(_sobol_timesteps(jnp.int32(0), 8))
    np.testing.assert_allclose(
        t0, [0, .5, .25, .75, .125, .625, .375, .875])
    t = np.sort(np.concatenate(
        [np.asarray(_sobol_timesteps(jnp.int32(s), 8)) for s in range(32)]))
    assert np.max(np.diff(t)) <= 1 / 256 + 1e-9
    # stateless fallback stratifies each batch
    s = _sample_timesteps(jax.random.PRNGKey(0), 8, "sobol", {}, step=None)
    assert np.max(np.diff(np.sort(np.asarray(s)))) < 2 / 8
