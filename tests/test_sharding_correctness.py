"""DP-sharded training must match single-device numerics; orbax sharded ckpts."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.parallel.mesh import (
    create_mesh,
    replicate_tree,
    shard_batch,
    zero_shard_opt_state,
)
from stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier

CFG = {
    "model_type": "diffusion_cond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "conditioning": {"configs": [
            {"id": "seconds_total", "type": "number",
             "config": {"min_val": 0, "max_val": 512}}], "cond_dim": 16},
        "diffusion": {"cross_attention_cond_ids": ["seconds_total"],
                      "type": "dit",
                      "config": {"io_channels": 2, "embed_dim": 16, "depth": 1,
                                 "num_heads": 2, "cond_token_dim": 16,
                                 "use_checkpointing": False}},
        "io_channels": 2,
    },
    "training": {"learning_rate": 1e-3, "cfg_dropout_prob": 0.0},
}


@pytest.fixture(scope="module")
def setup():
    model = create_model_from_config(CFG)
    trainer = create_training_wrapper_from_config(CFG, model)
    mc = model._multi_conditioner
    meta = [{"seconds_total": float(i)} for i in range(8)]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(meta))
    x = jnp.zeros((8, 2, 64))
    t = jnp.ones((8,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "cfg": jax.random.PRNGKey(2)},
        x, t, cond=prepared, method=model.init_full,
    )
    batch = {
        "audio": jnp.asarray(
            np.random.RandomState(0).randn(8, 2, 64).astype(np.float32) * 0.1
        ),
        "prepared_cond": prepared,
    }
    return model, trainer, variables, batch


def test_dp_sharded_loss_matches_single_device(setup):
    model, trainer, variables, batch = setup
    step_fn = jax.jit(trainer.make_train_step())

    # single-device baseline
    state0 = trainer.init_state(variables)
    s1, aux_single = step_fn(state0, batch, jax.random.PRNGKey(7))

    # 8-way DP with ZeRO opt-state sharding
    mesh = create_mesh(data=8, model=1)
    state = trainer.init_state(variables)
    state = state.replace(
        params=replicate_tree(state.params, mesh),
        ema_params=replicate_tree(state.ema_params, mesh),
        opt_state=jax.device_put(
            state.opt_state, zero_shard_opt_state(state.opt_state, mesh)
        ),
    )
    sbatch = shard_batch(batch, mesh)
    s2, aux_sharded = step_fn(state, sbatch, jax.random.PRNGKey(7))

    np.testing.assert_allclose(
        float(aux_single["loss"]), float(aux_sharded["loss"]), rtol=1e-4
    )
    # params after the step must match too (global grad reduction correct)
    p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-6)


def test_orbax_sharded_checkpoint_roundtrip(setup, tmp_path):
    from stable_audio_tools_tpu.io.checkpoints import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    model, trainer, variables, batch = setup
    mesh = create_mesh(data=8, model=1)
    state = trainer.init_state(variables)
    state = state.replace(
        opt_state=jax.device_put(
            state.opt_state, zero_shard_opt_state(state.opt_state, mesh)
        ),
    )
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, {"params": state.params,
                                 "opt_state": state.opt_state})
    restored = load_checkpoint_orbax(path)
    a = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(restored["params"])[0])
    np.testing.assert_allclose(a, b)


def test_chunked_codec_sharded_chunks_match_sequential():
    """decode_audio/encode_audio with chunk_pspec (vmap + mesh-sharded chunk
    axis) must match the sequential lax.map path exactly."""
    from jax.sharding import PartitionSpec as P, set_mesh

    from stable_audio_tools_tpu.models.factory import create_autoencoder_from_config

    ae_cfg = {
        "encoder": {"type": "oobleck", "config": {
            "in_channels": 2, "channels": 8, "c_mults": [1, 2],
            "strides": [2, 2], "latent_dim": 16, "use_snake": True}},
        "decoder": {"type": "oobleck", "config": {
            "out_channels": 2, "channels": 8, "c_mults": [1, 2],
            "strides": [2, 2], "latent_dim": 8, "use_snake": True}},
        "bottleneck": {"type": "vae"},
        "latent_dim": 8, "downsampling_ratio": 4, "io_channels": 2,
        "sample_rate": 16000,
    }
    model = create_autoencoder_from_config({"model": ae_cfg, "sample_rate": 16000})
    audio = jnp.asarray(
        np.random.RandomState(3).randn(1, 2, 1024).astype(np.float32) * 0.1
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        audio,
    )
    latents = jnp.asarray(
        np.random.RandomState(4).randn(1, 8, 256).astype(np.float32)
    )

    kw = dict(chunked=True, chunk_size=64, overlap=16)
    ref_dec = model.apply(variables, latents, method=model.decode_audio, **kw)
    ref_enc = model.apply(variables, audio, rngs={"sample": jax.random.PRNGKey(7)},
                          method=model.encode_audio, **kw)

    mesh = create_mesh(data=4, model=2)
    spec = P(("data", "model"))
    with set_mesh(mesh):
        got_dec = jax.jit(lambda v, z: model.apply(
            v, z, method=model.decode_audio, chunk_pspec=spec, **kw
        ))(variables, latents)
        got_enc = jax.jit(lambda v, a: model.apply(
            v, a, rngs={"sample": jax.random.PRNGKey(7)},
            method=model.encode_audio, chunk_pspec=spec, **kw
        ))(variables, audio)
    np.testing.assert_allclose(np.asarray(got_dec), np.asarray(ref_dec),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_enc), np.asarray(ref_enc),
                               rtol=1e-4, atol=1e-4)


def test_sequence_parallel_tp_matches_plain():
    """Opt-in sequence parallelism (seq_shard_constraint at block entry)
    must be numerically identical to the plain-TP program."""
    from jax.sharding import set_mesh

    from stable_audio_tools_tpu.models.dit import DiffusionTransformer
    from stable_audio_tools_tpu.parallel.mesh import (
        DIT_TP_RULES, mesh_program_context, tp_param_sharding,
    )

    dit = DiffusionTransformer(
        io_channels=4, embed_dim=64, depth=2, num_heads=4,
        cond_token_dim=32, project_cond_tokens=False,
    )
    B, seq = 2, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, seq))
    t = jnp.full((B,), 0.5)
    cross = jax.random.normal(jax.random.PRNGKey(1), (B, 10, 32))
    variables = dit.init(jax.random.PRNGKey(2), x, t, cross_attn_cond=cross)

    ref = dit.apply(variables, x, t, cross_attn_cond=cross)

    mesh = create_mesh(data=2, model=4)
    svars = jax.device_put(
        variables, tp_param_sharding(variables, mesh, DIT_TP_RULES)
    )
    with set_mesh(mesh), mesh_program_context(mesh, sequence_parallel=True):
        out = jax.jit(
            lambda v, x, t, c: dit.apply(v, x, t, cross_attn_cond=c)
        )(svars, x, t, cross)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_mesh_training_matches_single_device(setup):
    """Trainer-style TP training: params/opt-state sharded over the 'model'
    axis by DIT_TP_RULES, batch over 'data' — loss must match the
    single-device step."""
    from jax.sharding import set_mesh

    from stable_audio_tools_tpu.parallel.mesh import (
        DIT_TP_RULES, mesh_program_context, shard_batch, tp_param_sharding,
    )

    model, trainer, variables, batch = setup
    state = trainer.init_state(variables)
    train_step = jax.jit(trainer.make_train_step())

    _, aux_ref = train_step(state, batch, jax.random.PRNGKey(3))

    mesh = create_mesh(data=4, model=2)
    place = lambda tree: jax.device_put(
        tree, tp_param_sharding(tree, mesh, DIT_TP_RULES))
    tp_state = state.replace(
        params=place(state.params), opt_state=place(state.opt_state),
        ema_params=place(state.ema_params)
        if state.ema_params is not None else None,
    )
    sbatch = shard_batch(batch, mesh)
    with set_mesh(mesh), mesh_program_context(mesh):
        new_state, aux = train_step(tp_state, sbatch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(aux["loss"]), float(aux_ref["loss"]),
                               rtol=1e-5)
    # params updated and still finite
    l0 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert bool(jnp.all(jnp.isfinite(l0)))


def test_ae_gan_dp_mesh_matches_single_device():
    """One gen+disc pair of the GAN trainer under a data=8 mesh (params
    replicated, BOTH optimizer states ZeRO-sharded — mirrors
    Trainer._place_state) matches the single-device step.

    Parameter tolerance is self-calibrating: at step 0 Adam's update is
    lr*g/(|g|+eps), so reduction-order noise on a near-zero gradient flips
    a full +-lr regardless of how the batch is reduced.  We measure the
    single-device step's OWN sensitivity to a batch permutation
    (mathematically identical losses, different reduction order) and require
    the mesh deviation to be no larger."""
    from tests.test_ae_training import AE_TRAIN_CONFIG

    model = create_model_from_config(AE_TRAIN_CONFIG)
    trainer = create_training_wrapper_from_config(AE_TRAIN_CONFIG, model)
    audio = jnp.asarray(
        np.random.RandomState(0).randn(8, 2, 512).astype(np.float32) * 0.1
    )
    rng = jax.random.PRNGKey(0)
    host_state = jax.device_get(trainer.init_state(jax.random.PRNGKey(1), audio))

    def run_pair(state, reals):
        state, gen_logs = trainer.train_step(state, reals, rng, 0)
        state, disc_logs = trainer.train_step(state, reals, jax.random.fold_in(rng, 1), 1)
        return state, gen_logs, disc_logs

    # single device
    s1 = jax.tree_util.tree_map(jnp.asarray, host_state)
    s1, gen1, disc1 = run_pair(s1, audio)
    trainer._jit_cache.clear()

    # single device, permuted batch: calibrates the Adam-amplified
    # reduction-order noise floor (measured ~2e-3 = 2*lr sign flips on
    # near-zero-gradient params; mesh drift must not exceed it)
    perm = np.random.RandomState(7).permutation(audio.shape[0])
    sp = jax.tree_util.tree_map(jnp.asarray, host_state)
    sp, _, _ = run_pair(sp, audio[perm])
    trainer._jit_cache.clear()
    noise_floor = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(s1.gen_params),
                        jax.tree_util.tree_leaves(sp.gen_params))
    )

    # 8-device DP mesh
    mesh = create_mesh(data=8, model=1)
    s8 = jax.tree_util.tree_map(jnp.asarray, host_state)
    s8 = s8.replace(
        gen_params=replicate_tree(s8.gen_params, mesh),
        disc_params=replicate_tree(s8.disc_params, mesh),
        ema_params=replicate_tree(s8.ema_params, mesh),
        gen_opt_state=jax.device_put(
            s8.gen_opt_state, zero_shard_opt_state(s8.gen_opt_state, mesh)),
        disc_opt_state=jax.device_put(
            s8.disc_opt_state, zero_shard_opt_state(s8.disc_opt_state, mesh)),
    )
    sharded = shard_batch({"audio": audio}, mesh)["audio"]
    from stable_audio_tools_tpu.parallel.mesh import mesh_program_context

    with mesh_program_context(mesh):
        s8, gen8, disc8 = run_pair(s8, sharded)

    for k in gen1:
        np.testing.assert_allclose(
            float(gen1[k]), float(gen8[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"gen log {k}")
    for k in disc1:
        np.testing.assert_allclose(
            float(disc1[k]), float(disc8[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"disc log {k}")
    # params agree after the pair, up to the measured single-device
    # reduction-order noise floor (see docstring); tight floor of 5e-5
    # still catches genuine DP-path divergence (wrong psum scale = O(1)).
    # The measured sensitivity itself must stay below a FIXED ceiling
    # (2.5x the ~2e-3 = 2*lr historical value) so the self-calibrating
    # bound can't silently inflate and mask a real regression.
    assert noise_floor < 5e-3, (
        f"single-device batch-shuffle sensitivity {noise_floor:.2e} exceeds "
        "the 5e-3 ceiling — the self-calibrating mesh tolerance is no "
        "longer trustworthy; investigate the step's reduction numerics")
    atol = max(noise_floor, 5e-5)
    l1 = jax.tree_util.tree_leaves(s1.gen_params)
    l8 = jax.tree_util.tree_leaves(s8.gen_params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(jax.device_get(b)),
                                   rtol=0, atol=atol)


def test_gqa_kv_spec_replicates_uneven_heads():
    """12 cross-attn kv heads over TP=8 must replicate the to_kv kernel
    (uneven head groups force per-layer weight re-gathers otherwise);
    even splits keep the column sharding."""
    from jax.sharding import PartitionSpec as P

    from stable_audio_tools_tpu.parallel.mesh import gqa_kv_spec

    spec = gqa_kv_spec(dim_heads=64)
    mesh8 = create_mesh(data=1, model=8)
    mesh4 = create_mesh(data=2, model=4)
    # SA-Open cross-attn: dim_context 768 -> to_kv kernel [768, 1536],
    # 12 kv-head groups
    assert spec((768, 1536), mesh8) == P()          # 12 % 8 != 0
    assert spec((768, 1536), mesh4) == P(None, "model")  # 12 % 4 == 0
    # degenerate narrow kernel (< one head pair): replicate
    assert spec((32, 64), mesh8) == P()


def test_lm_dp_mesh_matches_single_device():
    """LM CE train step on a data=8 mesh (params replicated, ZeRO opt state)
    matches the single-device step (reference trains the LM under the same
    DDP strategy as every wrapper, train.py:124-138)."""
    from tests.test_lm import TINY_LM_CONFIG

    model = create_model_from_config(TINY_LM_CONFIG)
    trainer = create_training_wrapper_from_config(TINY_LM_CONFIG, model)
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(
        jnp.asarray, mc.gather_inputs([{"seconds_total": 4.0}] * 8))
    codes = jnp.zeros((1, 1, 16), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        codes, cond=jax.tree_util.tree_map(lambda x: x[:1], prepared))
    pt_vars = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 1, 256)), method=model.pretransform_tokenize)
    variables = {"params": {**pt_vars["params"], **variables["params"]}}
    batch = {
        "audio": jnp.asarray(
            np.random.RandomState(2).randn(8, 1, 256).astype(np.float32) * 0.1),
        "prepared_cond": prepared,
    }

    host_state = jax.device_get(trainer.init_state(variables))
    step = jax.jit(trainer.make_train_step())

    s1 = jax.tree_util.tree_map(jnp.asarray, host_state)
    s1, aux1 = step(s1, batch, jax.random.PRNGKey(0))

    from stable_audio_tools_tpu.parallel.mesh import mesh_program_context

    mesh = create_mesh(data=8, model=1)
    s8 = jax.tree_util.tree_map(jnp.asarray, host_state)
    s8 = s8.replace(
        params=replicate_tree(s8.params, mesh),
        opt_state=jax.device_put(
            s8.opt_state, zero_shard_opt_state(s8.opt_state, mesh)),
        ema_params=(replicate_tree(s8.ema_params, mesh)
                    if s8.ema_params is not None else None),
    )
    sbatch = shard_batch(batch, mesh)
    with mesh_program_context(mesh):
        s8, aux8 = step(s8, sbatch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(aux8["loss"]), float(aux1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(jax.device_get(b)),
                                   rtol=5e-4, atol=5e-5)


def test_lm_tp_decode_matches_single_device():
    """KV-cached greedy decode with DIT_TP_RULES-sharded backbone params on
    a model=2 mesh must emit the same tokens as the replicated decode."""
    from tests.test_lm import TINY_LM_CONFIG

    from stable_audio_tools_tpu.models.lm import lm_generate_cached
    from stable_audio_tools_tpu.parallel.mesh import (
        DIT_TP_RULES, mesh_program_context, tp_param_sharding)

    model = create_model_from_config(TINY_LM_CONFIG)
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(
        jnp.asarray, mc.gather_inputs([{"seconds_total": 4.0}]))
    codes = jnp.zeros((1, 1, 16), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        codes, cond=prepared)
    cond_tensors = model.apply(variables, prepared,
                               method=model.run_conditioner)
    kwargs = dict(conditioning_tensors=cond_tensors, max_gen_len=12,
                  top_k=0, temp=1e-6, rng=jax.random.PRNGKey(0))
    ref = lm_generate_cached(model, variables, **kwargs)

    mesh = create_mesh(data=4, model=2)
    tp_vars = jax.device_put(
        variables, tp_param_sharding(variables, mesh, DIT_TP_RULES))
    # bust the decode-prepared cache: it is keyed per params pytree id
    if hasattr(model, "_lm_jit_cache"):
        model._lm_jit_cache.clear()
    with mesh_program_context(mesh):
        out = lm_generate_cached(model, tp_vars, **kwargs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_arc_dp_mesh_matches_single_device():
    """One ARC adversarial gen+disc pair (relativistic GAN on DiT hidden
    states, contrastive + grad penalties) on a data=8 mesh (params
    replicated, both optimizer states ZeRO-sharded) matches the
    single-device pair. Same self-calibrating tolerance as the AE-GAN test:
    Adam at step 0 amplifies reduction-order noise on near-zero gradients
    to +-lr, so the bound is the single-device step's own sensitivity to a
    batch permutation. Match: reference trains ARC under the same DDP
    strategy as every wrapper (train.py:124-138)."""
    from tests.test_arc import RF_DIT_CONFIG
    from stable_audio_tools_tpu.parallel.mesh import mesh_program_context
    from stable_audio_tools_tpu.training.arc import ARCTrainer

    student = create_model_from_config(RF_DIT_CONFIG)
    disc = create_model_from_config(RF_DIT_CONFIG)
    mc = student._multi_conditioner
    meta = [{"prompt_num": 0.1 * i} for i in range(8)]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(meta))
    latents = jnp.asarray(
        np.random.RandomState(0).randn(8, 2, 32).astype(np.float32))
    t = jnp.ones((8,))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "cfg": jax.random.PRNGKey(2)}
    gen_vars = student.init(rngs, latents, t, cond=prepared)
    disc_vars = disc.init(rngs, latents, t, cond=prepared)
    trainer = ARCTrainer(
        model=student,
        discriminator=disc,
        arc_config={
            "ode_warmup": {"warmup_steps": 0},
            "gan": {"discriminator_dit_layer": 0, "grad_penalties": True,
                    "contrastive": True},
        },
        optimizer_configs={
            "diffusion": {"optimizer": {"type": "Adam", "config": {"lr": 1e-4}}},
            "discriminator": {"optimizer": {"type": "Adam", "config": {"lr": 1e-4}}},
        },
    )
    cond = student.apply(gen_vars, prepared, method=student.run_conditioner)
    rolled = jax.tree_util.tree_map(lambda x: jnp.roll(x, 1, axis=0), cond)
    host_state = jax.device_get(trainer.init_state(gen_vars, disc_vars, latents))
    rng = jax.random.PRNGKey(3)

    def run_pair(state, lat, c, rc):
        state, gen_aux = trainer.train_step(state, lat, c, rng, 0)
        state, disc_aux = trainer.train_step(
            state, lat, c, jax.random.fold_in(rng, 1), 1,
            rolled_cond_tensors=rc)
        return state, gen_aux, disc_aux

    s1 = jax.tree_util.tree_map(jnp.asarray, host_state)
    s1, gen1, disc1 = run_pair(s1, latents, cond, rolled)
    trainer._jit_cache.clear()

    # single-device, permuted batch: calibrates the Adam step-0
    # reduction-order noise floor (mathematically identical losses,
    # different reduction order)
    perm = np.random.RandomState(7).permutation(8)
    permute = lambda tree: jax.tree_util.tree_map(lambda x: x[perm], tree)
    sp = jax.tree_util.tree_map(jnp.asarray, host_state)
    sp, _, _ = run_pair(sp, latents[perm], permute(cond), permute(rolled))
    trainer._jit_cache.clear()
    noise_floor = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for pair in (("gen_params",), ("disc_params",), ("head_params",))
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(s1, pair[0])),
            jax.tree_util.tree_leaves(getattr(sp, pair[0])))
    )

    mesh = create_mesh(data=8, model=1)
    s8 = jax.tree_util.tree_map(jnp.asarray, host_state)
    s8 = s8.replace(
        gen_params=replicate_tree(s8.gen_params, mesh),
        disc_params=replicate_tree(s8.disc_params, mesh),
        head_params=replicate_tree(s8.head_params, mesh),
        ema_params=replicate_tree(s8.ema_params, mesh),
        gen_opt_state=jax.device_put(
            s8.gen_opt_state, zero_shard_opt_state(s8.gen_opt_state, mesh)),
        disc_opt_state=jax.device_put(
            s8.disc_opt_state, zero_shard_opt_state(s8.disc_opt_state, mesh)),
    )
    slat = shard_batch({"audio": latents}, mesh)["audio"]
    scond = shard_batch(cond, mesh)
    srolled = shard_batch(rolled, mesh)
    with mesh_program_context(mesh):
        s8, gen8, disc8 = run_pair(s8, slat, scond, srolled)

    for k in gen1:
        np.testing.assert_allclose(
            float(gen1[k]), float(gen8[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"gen log {k}")
    for k in disc1:
        np.testing.assert_allclose(
            float(disc1[k]), float(disc8[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"disc log {k}")
    # fixed ceiling on the measured sensitivity (2.5x the ~2e-4 = 2*lr
    # historical value) so the self-calibrating bound can't silently inflate
    assert noise_floor < 5e-4, (
        f"single-device batch-shuffle sensitivity {noise_floor:.2e} exceeds "
        "the 5e-4 ceiling — the self-calibrating mesh tolerance is no "
        "longer trustworthy; investigate the step's reduction numerics")
    atol = max(noise_floor, 5e-5)
    for name in ("gen_params", "disc_params", "head_params"):
        for a, b in zip(jax.tree_util.tree_leaves(getattr(s1, name)),
                        jax.tree_util.tree_leaves(getattr(s8, name))):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(jax.device_get(b)), rtol=0,
                atol=atol, err_msg=name)
