"""Audit the collectives GSPMD inserts for TP-sharded DiT inference.

Compiles one SA-Open-scale denoiser step (DiT 24x1536, 24 heads, CFG batch 2,
seq 1024) over an 8-way 'model' mesh of virtual CPU devices, then parses the
compiled HLO for collective ops and their byte volumes. This is the evidence
base for docs/multichip.md's projected v5e-8 wall-clock.

Usage: python scripts/audit_tp_hlo.py [--tp 8] [--seq 1024] [--small]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--sp", action="store_true",
                    help="enable sequence-parallel residual constraints "
                         "(opt-in; see docs/multichip.md for why it is off "
                         "by default) for A/B against the plain-TP pattern")
    ap.add_argument("--dump", type=str, default=None,
                    help="write full HLO text here")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.tp}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stable_audio_tools_tpu.models.dit import DiffusionTransformer
    from stable_audio_tools_tpu.parallel.mesh import (
        DIT_TP_RULES, create_mesh, tp_param_sharding,
    )

    if args.small:
        dims = dict(io_channels=64, embed_dim=512, depth=2, num_heads=8,
                    cond_token_dim=256)
    else:
        dims = dict(io_channels=64, embed_dim=1536, depth=24, num_heads=24,
                    cond_token_dim=768)
    model = DiffusionTransformer(
        project_cond_tokens=False, global_cond_dim=dims["embed_dim"],
        compute_dtype="bfloat16", **dims,
    )

    B = 2  # CFG-doubled batch
    x = jnp.zeros((B, dims["io_channels"], args.seq), jnp.float32)
    t = jnp.full((B,), 0.5)
    cross = jnp.zeros((B, 130, dims["cond_token_dim"]), jnp.float32)
    glob = jnp.zeros((B, dims["embed_dim"]), jnp.float32)

    mesh = create_mesh(data=1, model=args.tp)
    variables = jax.jit(lambda x, t: model.init(
        jax.random.PRNGKey(0), x, t, cross_attn_cond=cross, global_embed=glob
    ))(x, t)
    n_params = sum(v.size for v in jax.tree_util.tree_leaves(variables))
    variables = jax.device_put(
        variables, tp_param_sharding(variables, mesh, DIT_TP_RULES)
    )

    def step(variables, x, t, cross, glob):
        return model.apply(variables, x, t, cross_attn_cond=cross,
                           global_embed=glob)

    # trace like inference/generation.py::_call_with_mesh; --sp additionally
    # enables the sequence-parallel residual constraints
    # (parallel/mesh.py::seq_shard_constraint)
    from jax.sharding import set_mesh

    from stable_audio_tools_tpu.parallel.mesh import mesh_program_context

    with set_mesh(mesh), mesh_program_context(mesh, sequence_parallel=args.sp):
        lowered = jax.jit(step).lower(variables, x, t, cross, glob)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    from stable_audio_tools_tpu.parallel.hlo_audit import count_collectives

    counts = count_collectives(hlo)
    total_bytes = sum(b for _, b in counts.values())

    print(f"DiT {dims['embed_dim']}x{dims['depth']} seq={args.seq} "
          f"params={n_params/1e6:.0f}M TP={args.tp}")
    flops = compiled.cost_analysis().get("flops", 0)
    print(f"HLO flops (per step, all devices): {flops/1e9:.1f} G")
    if not counts:
        print("NO collectives found (fully local program)")
    for op, (c, b) in sorted(counts.items()):
        print(f"  {op:20s} x{c:4d}  {b/1e6:9.2f} MB")
    print(f"  {'TOTAL':20s}       {total_bytes/1e6:9.2f} MB per step")
    # v5e ICI: ~4.5e10 B/s per link x 4 links full-duplex (scaling-book
    # figures); one all-gather/all-reduce of V bytes on an 8-ring costs
    # ~V * (n-1)/n / bw_per_direction.
    ici_bw = 9e10
    print(f"  est. ICI time/step @ {ici_bw/1e9:.0f} GB/s: "
          f"{total_bytes / ici_bw * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
