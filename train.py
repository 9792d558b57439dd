"""Training CLI — flag-compatible with the reference train.py.

Parses defaults.ini + CLI flags (prefigure equivalent), builds the
dataloader / model / training wrapper from JSON configs, and runs the JAX
Trainer (data-parallel mesh + ZeRO-sharded optimizer instead of
Lightning DDP/DeepSpeed; reference train.py:24-169).
"""

import argparse
import configparser
import json
import os


def parse_args():
    ini = configparser.ConfigParser()
    defaults = {}
    if os.path.exists("defaults.ini"):
        ini.read("defaults.ini")
        defaults = dict(ini["DEFAULTS"]) if "DEFAULTS" in ini else {}

    def dget(key, fallback, cast=str):
        v = defaults.get(key, fallback)
        if isinstance(v, str):
            v = v.strip("'\"")
        try:
            return cast(v)
        except (TypeError, ValueError):
            return fallback

    def dbool(key, fallback=False):
        v = defaults.get(key, fallback)
        if isinstance(v, str):
            return v.strip("'\"").lower() in ("true", "1", "yes")
        return bool(v)

    p = argparse.ArgumentParser(description="stable-audio-tools-tpu trainer")
    p.add_argument("--name", type=str, default=dget("name", "stable_audio_tools"))
    p.add_argument("--project", type=str, default=dget("project", None))
    p.add_argument("--batch-size", type=int, default=dget("batch_size", 4, int))
    p.add_argument("--num-workers", type=int, default=dget("num_workers", 6, int))
    # -- reference CLI surface (reference train.py:70-81,124-138 +
    #    defaults.ini) — accepted everywhere, mapped to TPU equivalents in
    #    main() (GSPMD mesh replaces DDP/DeepSpeed; see docs/migration.md)
    p.add_argument("--num-gpus", type=int, default=dget("num_gpus", 1, int),
                   help="reference flag; JAX discovers devices — informational "
                        "(warns if it disagrees with the visible device count)")
    p.add_argument("--num-nodes", type=int, default=dget("num_nodes", 1, int),
                   help="reference flag; >1 initializes jax.distributed "
                        "(multi-host), same as --multihost")
    p.add_argument("--strategy", type=str, default=dget("strategy", "auto"),
                   help="reference flag; 'deepspeed'/'ddp*' map to the GSPMD "
                        "mesh (ZeRO-sharded optimizer state is always on)")
    p.add_argument("--precision", type=str, default=dget("precision", "16-mixed"),
                   help="reference flag; '16-mixed'/'bf16*' set "
                        "training.compute_dtype=bfloat16, '32*' float32")
    p.add_argument("--recover", action="store_true", default=dbool("recover"),
                   help="resume from the latest step=*.ckpt in --save-dir")
    p.add_argument("--save-top-k", type=int, default=dget("save_top_k", -1, int),
                   help="keep only the newest K checkpoints (-1 = all)")
    p.add_argument("--remove-pretransform-weight-norm", type=str,
                   default=dget("remove_pretransform_weight_norm", ""),
                   choices=["", "pre_load", "post_load"],
                   help="re-normalize pretransform weight-norm params before "
                        "or after the pretransform ckpt load")
    p.add_argument("--seed", type=int, default=dget("seed", 42, int))
    p.add_argument("--accum-batches", type=int, default=dget("accum_batches", 1, int))
    p.add_argument("--checkpoint-every", type=int,
                   default=dget("checkpoint_every", 10000, int))
    p.add_argument("--val-every", type=int, default=dget("val_every", -1, int))
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--ckpt-path", type=str, default=dget("ckpt_path", ""))
    p.add_argument("--pretrained-ckpt-path", type=str,
                   default=dget("pretrained_ckpt_path", ""))
    p.add_argument("--pretransform-ckpt-path", type=str,
                   default=dget("pretransform_ckpt_path", ""))
    p.add_argument("--model-config", type=str, default=dget("model_config", ""))
    p.add_argument("--dataset-config", type=str, default=dget("dataset_config", ""))
    p.add_argument("--val-dataset-config", type=str,
                   default=dget("val_dataset_config", ""))
    p.add_argument("--save-dir", type=str, default=dget("save_dir", "checkpoints"))
    p.add_argument("--gradient-clip-val", type=float,
                   default=dget("gradient_clip_val", 0.0, float))
    p.add_argument("--logger", type=str, default=dget("logger", "jsonl"))
    p.add_argument("--demo-every", type=int, default=0)
    p.add_argument("--mesh-model", type=int,
                   default=dget("mesh_model", 1, int),
                   help="size of the 'model' (tensor-parallel) mesh axis; "
                        "devices/mesh_model becomes the 'data' axis")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host training")
    p.add_argument("--profile-dir", type=str, default="",
                   help="write a jax.profiler trace of steps 10-12 here")
    return p.parse_args()


# reference --precision values → JAX compute dtype ("16-mixed" is fp16
# autocast on GPU; bf16 is the TPU-native equivalent)
_PRECISION_DTYPE = {
    "16-mixed": "bfloat16", "16-true": "bfloat16", "16": "bfloat16",
    "bf16-mixed": "bfloat16", "bf16-true": "bfloat16", "bf16": "bfloat16",
    "32-true": "float32", "32": "float32", "64": "float32",
}


def main():
    args = parse_args()
    assert args.model_config, "--model-config is required"
    assert args.dataset_config, "--dataset-config is required"

    import jax

    if args.multihost or args.num_nodes > 1:
        # multi-host DCN init (reference: SLURM + NCCL; here jax.distributed)
        jax.distributed.initialize()
    import numpy as np

    # -- reference-flag mapping (reference train.py:124-138) ----------------
    n_dev = jax.device_count()
    if args.num_gpus > 1 and n_dev != args.num_gpus:
        print(f"[train] --num-gpus {args.num_gpus} requested but JAX sees "
              f"{n_dev} device(s); the mesh always uses all visible devices "
              "(the flag is accepted for reference-CLI compatibility)")
    if args.strategy and args.strategy != "auto":
        print(f"[train] --strategy {args.strategy!r} → GSPMD mesh training "
              "(ZeRO-style sharded optimizer state is always on; DDP/DeepSpeed "
              "are torch-runtime concepts)")
    if args.recover and not args.ckpt_path:
        import glob
        import re

        cands = []
        for c in glob.glob(os.path.join(args.save_dir, "step=*.ckpt")):
            m = re.search(r"step=(\d+)\.ckpt$", c)
            if m:
                cands.append((int(m.group(1)), c))
        if cands:
            args.ckpt_path = max(cands)[1]
            print(f"[train] --recover: resuming from {args.ckpt_path}")
        else:
            print(f"[train] --recover: no step=*.ckpt under {args.save_dir!r}; "
                  "starting fresh")

    from stable_audio_tools_tpu.data.dataset import create_dataloader_from_config
    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config,
    )
    from stable_audio_tools_tpu.training.trainer import Trainer
    from stable_audio_tools_tpu.io.checkpoints import (
        copy_state_dict,
        load_ckpt_state_dict,
    )

    with open(args.model_config) as f:
        model_config = json.load(f)
    with open(args.dataset_config) as f:
        dataset_config = json.load(f)

    dt = _PRECISION_DTYPE.get(str(args.precision))
    if dt is None:
        print(f"[train] --precision {args.precision!r} not recognized; "
              "leaving compute dtype to the model/training config")
    else:
        # config-specified compute_dtype wins; the flag supplies the default
        model_config.setdefault("training", {}).setdefault("compute_dtype", dt)

    model = create_model_from_config(model_config)
    wrapper = create_training_wrapper_from_config(model_config, model)

    dataloader = create_dataloader_from_config(
        dataset_config,
        batch_size=args.batch_size,
        sample_size=model_config["sample_size"],
        sample_rate=model_config["sample_rate"],
        audio_channels=model_config.get("audio_channels", 2),
        num_workers=args.num_workers,
    )

    # init state from a template batch
    import jax.numpy as jnp

    audio, metadata = next(iter(dataloader))
    model_type = model_config["model_type"]
    rng = jax.random.PRNGKey(args.seed)
    if model_type == "autoencoder":
        if args.remove_pretransform_weight_norm:
            print("[train] --remove-pretransform-weight-norm is not applied "
                  "to autoencoder training states; ignored")
        state = wrapper.init_state(rng, jnp.asarray(audio))
    else:
        from stable_audio_tools_tpu.models.handle import (
            init_variables_from_config,
            inject_pretransform_ckpt,
        )

        # shared template init: handles diffusion AND lm model types, merges
        # every codec collection, imports the pretransform's configured
        # pretrained-codec ckpt (the frozen codec must never run random-init)
        def _remove_pretransform_wn(variables):
            # reference train.py:73-81 / models/utils.py:31 → re-normalize the
            # pretransform's weight-norm params (g := ||v||, numerically a
            # no-op at inference)
            from stable_audio_tools_tpu.io.checkpoints import (
                remove_weight_norm_from_model,
            )

            params = dict(variables.get("params", {}))
            if "pretransform" not in params:
                print("[train] --remove-pretransform-weight-norm: model has "
                      "no pretransform params; ignored")
                return variables
            params["pretransform"] = remove_weight_norm_from_model(
                params["pretransform"]
            )
            return {**variables, "params": params}

        variables = init_variables_from_config(model, model_config, args.seed)
        if args.remove_pretransform_weight_norm == "pre_load":
            variables = _remove_pretransform_wn(variables)
        if args.pretransform_ckpt_path:
            variables = inject_pretransform_ckpt(
                model, variables, args.pretransform_ckpt_path
            )
        if args.remove_pretransform_weight_norm == "post_load":
            variables = _remove_pretransform_wn(variables)
        if args.pretrained_ckpt_path:
            sd = load_ckpt_state_dict(args.pretrained_ckpt_path)
            new_params, loaded, skipped = copy_state_dict(variables["params"], sd)
            print(f"Loaded {loaded} tensors from pretrained ckpt "
                  f"({len(skipped)} skipped)")
            variables = {**variables, "params": new_params}
        state = wrapper.init_state(variables)

    os.makedirs(args.save_dir, exist_ok=True)

    demo_callback = None
    demo_every = args.demo_every
    demo_cfg = model_config.get("training", {}).get("demo", {})
    if demo_every == 0 and demo_cfg.get("demo_every"):
        demo_every = demo_cfg["demo_every"]
    if demo_every:
        from stable_audio_tools_tpu.training.demos import (
            create_demo_callback_from_config,
        )

        demo_callback = create_demo_callback_from_config(
            model_config, demo_dir=os.path.join(args.save_dir, "demos"),
            demo_dl=dataloader,
        )

    val_dataloader = None
    if args.val_dataset_config and args.val_every > 0:
        with open(args.val_dataset_config) as f:
            val_cfg = json.load(f)
        val_dataloader = create_dataloader_from_config(
            val_cfg, batch_size=args.batch_size,
            sample_size=model_config["sample_size"],
            sample_rate=model_config["sample_rate"],
            audio_channels=model_config.get("audio_channels", 2),
            num_workers=args.num_workers, shuffle=False,
        )

    from stable_audio_tools_tpu.training.utils import create_logger

    logger = create_logger(args.logger, args.save_dir, project=args.project,
                           name=args.name, config=model_config)

    trainer = Trainer(
        wrapper, model, model_config,
        save_dir=args.save_dir,
        logger=logger,
        checkpoint_every=args.checkpoint_every,
        demo_every=demo_every,
        demo_callback=demo_callback,
        max_steps=args.max_steps,
        accum_batches=args.accum_batches,
        mesh_model=args.mesh_model,
        seed=args.seed,
        val_every=max(args.val_every, 0),
        profile_dir=args.profile_dir or None,
        save_top_k=args.save_top_k,
    )
    trainer.fit(dataloader, state=state,
                ckpt_path=args.ckpt_path or None,
                val_dataloader=val_dataloader)


if __name__ == "__main__":
    main()
