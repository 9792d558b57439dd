"""Consolidate a sharded orbax checkpoint into a single msgpack/safetensors file.

Counterpart of the reference's scripts/ds_zero_to_pl_ckpt.py (DeepSpeed ZeRO
shards → fp32 Lightning ckpt): ZeRO-sharded optimizer/param state saved with
orbax on a mesh is gathered to host and written as one portable file.
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", type=str, required=True,
                   help="orbax checkpoint directory")
    p.add_argument("--output", type=str, required=True,
                   help="output .ckpt (msgpack) or .safetensors path")
    args = p.parse_args()

    import jax
    import numpy as np

    from stable_audio_tools_tpu.io.checkpoints import (
        export_safetensors,
        load_checkpoint_orbax,
        save_checkpoint,
    )

    state = load_checkpoint_orbax(args.ckpt_dir)
    # gather any sharded arrays to host
    state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "addressable_shards") else x, state
    )
    if args.output.endswith(".safetensors"):
        params = state.get("params", state) if isinstance(state, dict) else state
        export_safetensors(args.output, params)
    else:
        save_checkpoint(args.output, state)
    print(f"Consolidated {args.ckpt_dir} -> {args.output}")


if __name__ == "__main__":
    main()
