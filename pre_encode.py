"""Batch pre-encode a dataset to .npy latents + .json metadata.

Capability parity with reference pre_encode.py: encodes audio through a
(frozen) autoencoder to latents (or tokens for discrete models), saving
per-sample .npy + .json with padding masks interpolated to the latent rate,
into per-process output dirs ({rank}/{id}.npy, reference :94-121).
"""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", type=str, required=True)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--dataset-config", type=str, required=True)
    p.add_argument("--output-path", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--sample-size", type=int, default=None)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # warm up device->host transfers (first transfer on axon can stall minutes)
    np.asarray(jax.block_until_ready(jnp.zeros(())))

    from stable_audio_tools_tpu.data.dataset import create_dataloader_from_config
    from stable_audio_tools_tpu.io.checkpoints import load_checkpoint
    from stable_audio_tools_tpu.models.factory import create_model_from_config

    with open(args.model_config) as f:
        model_config = json.load(f)
    with open(args.dataset_config) as f:
        dataset_config = json.load(f)

    model = create_model_from_config(model_config)
    assert model_config["model_type"] == "autoencoder", (
        "pre_encode expects an autoencoder model config"
    )
    sample_size = args.sample_size or model_config["sample_size"]

    dataloader = create_dataloader_from_config(
        dataset_config,
        batch_size=args.batch_size,
        sample_size=sample_size,
        sample_rate=model_config["sample_rate"],
        audio_channels=model_config.get("audio_channels", 2),
        shuffle=False,
    )

    audio0, _ = next(iter(dataloader))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        {"params": rng, "sample": jax.random.fold_in(rng, 1)}, jnp.asarray(audio0)
    )
    if args.ckpt_path:
        ckpt = load_checkpoint(args.ckpt_path, None)
        if isinstance(ckpt, dict) and "params" in ckpt:
            variables = {"params": ckpt["params"]}

    encode = jax.jit(
        lambda v, a, r: model.apply(v, a, rngs={"sample": r}, method=model.encode)
    )

    rank = jax.process_index()
    out_dir = os.path.join(args.output_path, str(rank))
    os.makedirs(out_dir, exist_ok=True)

    idx = 0
    for audio, metadata in dataloader:
        latents = np.asarray(
            encode(variables, jnp.asarray(audio), jax.random.fold_in(rng, idx))
        )
        for b in range(latents.shape[0]):
            md = dict(metadata[b])
            pm = np.asarray(md.pop("padding_mask", np.ones(audio.shape[-1])))
            # interpolate padding mask to latent rate (reference :108-113)
            S = latents.shape[-1]
            lat_mask = pm[np.floor(np.arange(S) * (len(pm) / S)).astype(int)]
            md["padding_mask"] = lat_mask.tolist()
            md = {k: v for k, v in md.items()
                  if isinstance(v, (str, int, float, list, bool))}
            np.save(os.path.join(out_dir, f"{idx}.npy"), latents[b])
            with open(os.path.join(out_dir, f"{idx}.json"), "w") as f:
                json.dump(md, f)
            idx += 1
            if args.limit is not None and idx >= args.limit:
                print(f"Pre-encoded {idx} samples to {out_dir}")
                return
    print(f"Pre-encoded {idx} samples to {out_dir}")


if __name__ == "__main__":
    main()
