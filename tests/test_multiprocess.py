"""True multi-host semantics without a cluster: two OS processes join a
jax.distributed CPU cluster (Gloo collectives), build the SAME tiny
diffusion-cond trainer, feed rank-local batch halves into one global
DP-sharded array, and run jitted train steps. Loss and updated params must
match a plain single-process run over the combined batch — proving the
psum-of-grads path, replicated-state semantics, and rank-local data feeding
end-to-end (reference relies on PL DDP/NCCL for all of this)."""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
    "training": {"learning_rate": 1e-3, "cfg_dropout_prob": 0.0,
                 "use_ema": False},
}

SETUP = textwrap.dedent("""
    import numpy as np
    import jax.numpy as jnp
    import jax

    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config,
    )

    def build(cfg):
        model = create_model_from_config(cfg)
        trainer = create_training_wrapper_from_config(cfg, model)
        mc = model._multi_conditioner
        meta = [{"seconds_total": float(i)} for i in range(4)]
        prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(meta))
        x = jnp.zeros((4, 2, 64))
        t = jnp.ones((4,))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1),
             "cfg": jax.random.PRNGKey(2)},
            x, t, cond=prepared, method=model.init_full,
        )
        audio = np.random.RandomState(0).randn(4, 2, 64).astype(np.float32) * 0.1
        return model, trainer, variables, prepared, audio
""")

WORKER = """
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
{setup}
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stable_audio_tools_tpu.parallel.mesh import create_mesh

cfg = json.loads({cfg!r})
model, trainer, variables, prepared, audio = build(cfg)
state = trainer.init_state(variables)

mesh = create_mesh(data=4, model=1)
rep = NamedSharding(mesh, P())
state = jax.device_put(state, rep)

def to_global(x):
    # this process contributes rows [pid*2, pid*2+2) of the global batch
    x = np.asarray(x)
    local = x[pid * 2:(pid + 1) * 2]
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, x.shape)

batch = {{
    "audio": to_global(audio),
    "prepared_cond": jax.tree_util.tree_map(to_global, prepared),
}}
train_step = jax.jit(trainer.make_train_step())
losses = []
for s in range(2):
    with mesh:
        state, aux = train_step(state, batch, jax.random.PRNGKey(7 + s))
    losses.append(float(aux["loss"]))
checksum = float(sum(jnp.sum(jnp.abs(l))
                     for l in jax.tree_util.tree_leaves(state.params)))
print("RESULT", json.dumps({{"pid": pid, "losses": losses,
                             "checksum": checksum}}), flush=True)
"""


def test_two_process_distributed_train_matches_single():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = WORKER.format(repo=REPO, cfg=json.dumps(CFG), port=port,
                           setup=SETUP)
    path = "/tmp/sat_dist_worker.py"
    with open(path, "w") as f:
        f.write(script)
    procs = [subprocess.Popen([sys.executable, path, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    results = []
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    # both processes observe identical global loss and end in identical state
    assert results[0]["losses"] == results[1]["losses"]
    np.testing.assert_allclose(results[0]["checksum"], results[1]["checksum"],
                               rtol=1e-6)

    # single-process reference over the combined batch (same init/seeds)
    import jax
    import jax.numpy as jnp

    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config,
    )

    model = create_model_from_config(CFG)
    trainer = create_training_wrapper_from_config(CFG, model)
    mc = model._multi_conditioner
    meta = [{"seconds_total": float(i)} for i in range(4)]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(meta))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "cfg": jax.random.PRNGKey(2)},
        jnp.zeros((4, 2, 64)), jnp.ones((4,)), cond=prepared,
        method=model.init_full,
    )
    audio = np.random.RandomState(0).randn(4, 2, 64).astype(np.float32) * 0.1
    state = trainer.init_state(variables)
    batch = {"audio": jnp.asarray(audio), "prepared_cond": prepared}
    train_step = jax.jit(trainer.make_train_step())
    ref_losses = []
    for s in range(2):
        state, aux = train_step(state, batch, jax.random.PRNGKey(7 + s))
        ref_losses.append(float(aux["loss"]))
    ref_checksum = float(sum(jnp.sum(jnp.abs(l))
                             for l in jax.tree_util.tree_leaves(state.params)))
    np.testing.assert_allclose(results[0]["losses"], ref_losses,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(results[0]["checksum"], ref_checksum,
                               rtol=1e-5)
