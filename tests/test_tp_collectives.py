"""Pin the TP collective floor: 3 all-reduces/layer, nothing else.

docs/multichip.md's projected v5e-8 wall-clock rests on the audited GSPMD
communication pattern for the TP-sharded DiT denoiser (scripts/
audit_tp_hlo.py): exactly 3 all-reduces per transformer layer (self-attn
out-proj, cross-attn out-proj, FF down-proj — the canonical Megatron
pattern) and ZERO all-gathers / collective-permutes / all-to-alls. A
sharding-rule regression that degenerates into weight all-gathers would
silently invalidate that projection; this test compiles the small TP
program on the virtual 8-device CPU mesh and asserts the counts.

Match: SURVEY §2.10 (NCCL/DDP → GSPMD mesh replacement).
"""

import jax
import jax.numpy as jnp
import pytest

from stable_audio_tools_tpu.parallel.hlo_audit import count_collectives
from stable_audio_tools_tpu.parallel.mesh import (
    DIT_TP_RULES,
    create_mesh,
    mesh_program_context,
    tp_param_sharding,
)

DEPTH = 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_collective_floor_pinned():
    from stable_audio_tools_tpu.models.dit import DiffusionTransformer

    dims = dict(io_channels=64, embed_dim=512, depth=DEPTH, num_heads=8,
                cond_token_dim=256)
    model = DiffusionTransformer(
        project_cond_tokens=False, global_cond_dim=dims["embed_dim"],
        compute_dtype="bfloat16", **dims,
    )
    B, seq = 2, 128
    x = jnp.zeros((B, dims["io_channels"], seq), jnp.float32)
    t = jnp.full((B,), 0.5)
    cross = jnp.zeros((B, 24, dims["cond_token_dim"]), jnp.float32)
    glob = jnp.zeros((B, dims["embed_dim"]), jnp.float32)

    mesh = create_mesh(data=1, model=8)
    variables = jax.jit(lambda x, t: model.init(
        jax.random.PRNGKey(0), x, t, cross_attn_cond=cross, global_embed=glob
    ))(x, t)
    variables = jax.device_put(
        variables, tp_param_sharding(variables, mesh, DIT_TP_RULES))

    def step(variables, x, t, cross, glob):
        return model.apply(variables, x, t, cross_attn_cond=cross,
                           global_embed=glob)

    from jax.sharding import set_mesh

    with set_mesh(mesh), mesh_program_context(mesh):
        hlo = (jax.jit(step)
               .lower(variables, x, t, cross, glob)
               .compile().as_text())

    counts = count_collectives(hlo)
    n_ar = counts.get("all-reduce", [0, 0])[0]
    assert n_ar == 3 * DEPTH, (
        f"expected {3 * DEPTH} all-reduces ({DEPTH} layers x "
        f"attn-out/cross-out/ff-down), got {n_ar}: {counts}")
    banned = {op: c for op, c in counts.items() if op != "all-reduce"}
    assert not banned, (
        "TP program grew non-all-reduce collectives (weight gathers / "
        f"permutes degrade the ICI projection): {banned}")
