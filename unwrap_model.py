"""Export a bare (EMA) model from a wrapped training checkpoint.

Capability parity with reference unwrap_model.py: loads the training-wrapper
checkpoint, swaps in EMA weights, and writes a bare model checkpoint
(.safetensors or msgpack) usable for inference / pretransforms / fine-tuning.
"""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", type=str, default=None)
    p.add_argument("--ckpt-path", type=str, required=True)
    p.add_argument("--name", type=str, default="exported_model")
    p.add_argument("--use-safetensors", action="store_true")
    p.add_argument("--reference-layout", action="store_true",
                   help="export DiT weights with reference (PyTorch) tensor "
                        "names/layouts for cross-framework compatibility")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from stable_audio_tools_tpu.io.checkpoints import (
        export_safetensors,
        load_checkpoint,
        save_checkpoint,
    )
    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config,
    )

    model_config_path = args.model_config
    if model_config_path is None:
        candidate = args.ckpt_path + ".json"
        if os.path.exists(candidate):
            with open(candidate) as f:
                meta = json.load(f)
            model_config = meta["model_config"]
        else:
            raise SystemExit("--model-config required (no embedded config found)")
    else:
        with open(model_config_path) as f:
            model_config = json.load(f)

    model = create_model_from_config(model_config)
    wrapper = create_training_wrapper_from_config(model_config, model)

    # build a template state to restore into
    model_type = model_config["model_type"]
    if model_type == "autoencoder":
        io_ch = model_config["model"]["io_channels"]
        audio = jnp.zeros((1, io_ch, max(model.downsampling_ratio * 4, 64)))
        state = wrapper.init_state(jax.random.PRNGKey(0), audio)
        state = load_checkpoint(args.ckpt_path, state)
        params = wrapper.export_params(state)
    else:
        mc = getattr(model, "_multi_conditioner", None)
        # minimal init: template latents
        ratio = (model.pretransform.downsampling_ratio
                 if model.pretransform is not None else 1)
        x = jnp.zeros((1, model.io_channels, max(model_config["sample_size"] // ratio, 8)))
        t = jnp.ones((1,))
        init_kwargs = {}
        if mc is not None:
            # synthesize neutral conditioning from conditioner defaults
            meta = [{c["id"]: 0 for c in
                     model_config["model"]["conditioning"]["configs"]}]
            init_kwargs["cond"] = jax.tree_util.tree_map(
                jnp.asarray, mc.gather_inputs(meta)
            )
        variables = jax.jit(
            lambda x, t: model.init(
                {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1),
                 "cfg": jax.random.PRNGKey(2)},
                x, t, method=model.init_full, **init_kwargs,
            )
        )(x, t)
        state = wrapper.init_state(variables)
        state = load_checkpoint(args.ckpt_path, state)
        params = state.ema_params if state.ema_params is not None else state.params

    if args.use_safetensors:
        out = f"{args.name}.safetensors"
        if args.reference_layout and model_type in ("diffusion_cond",
                                                    "diffusion_cond_inpaint"):
            import numpy as np
            from safetensors.numpy import save_file

            from stable_audio_tools_tpu.io.torch_mapping import (
                export_dit_state_dict,
            )

            dit = model.model.dit
            sd = export_dit_state_dict(
                params["model"]["dit"],
                dim_heads=dit.embed_dim // dit.num_heads)
            save_file({k: np.asarray(v) for k, v in sd.items()}, out,
                      metadata={"model_config": json.dumps(model_config)})
            print(f"Exported reference-layout model to {out}")
            return
        export_safetensors(out, params, metadata={"model_config": json.dumps(model_config)})
    else:
        out = f"{args.name}.ckpt"
        save_checkpoint(out, {"params": params}, metadata={"model_config": model_config})
    print(f"Exported model to {out}")


if __name__ == "__main__":
    main()
