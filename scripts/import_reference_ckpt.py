"""Published-checkpoint rehearsal: import a reference (torch-layout) bundle,
verify recorded activations, and generate audio.

One command against a local stable-audio-open-style bundle (reference
models/pretrained.py:8-25 downloads `model_config.json` +
`model.safetensors`; this environment has no network, so point --dir at a
local copy):

    python scripts/import_reference_ckpt.py --dir /path/to/sa_open_bundle \
        [--prompt "..."] [--seconds 1.0] [--steps 8] [--out out.wav] \
        [--fixtures acts.npz] [--save-fixtures acts.npz] [--cpu]

- Imports the full wrapped model (VAE pretransform + DiT + conditioner
  projections + frozen T5/CLAP host towers) via
  io/torch_mapping.py::import_diffusion_cond_state_dict, or a bare
  autoencoder via io/checkpoints.py::import_autoencoder_state_dict.
- --fixtures: .npz of recorded denoiser inputs/outputs; the imported
  model must reproduce them (rtol/atol stored in the file). The CI test
  (tests/test_import_rehearsal.py) exercises this path with a tiny
  reference-layout bundle, so the plumbing works before real weights show up.
- --save-fixtures: record a fixture pack from the imported model.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True,
                   help="bundle dir: model_config.json + model.safetensors "
                        "(or model.ckpt)")
    p.add_argument("--prompt", default="A dog barking next to a waterfall")
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--cfg-scale", type=float, default=6.0)
    p.add_argument("--out", default="rehearsal_out.wav")
    p.add_argument("--fixtures", default=None,
                   help=".npz activation fixtures to verify (defaults to "
                        "<dir>/activation_fixtures.npz when present)")
    p.add_argument("--save-fixtures", default=None)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return p.parse_args()


def load_bundle(bundle_dir):
    from stable_audio_tools_tpu.io.checkpoints import load_ckpt_state_dict

    cfg_path = os.path.join(bundle_dir, "model_config.json")
    assert os.path.exists(cfg_path), f"missing {cfg_path}"
    with open(cfg_path) as f:
        model_config = json.load(f)
    ckpt = None
    for name in ("model.safetensors", "model.ckpt"):
        c = os.path.join(bundle_dir, name)
        if os.path.exists(c):
            ckpt = c
            break
    assert ckpt is not None, f"no model.safetensors / model.ckpt in {bundle_dir}"
    return model_config, load_ckpt_state_dict(ckpt)


def import_model(model_config, sd):
    from stable_audio_tools_tpu.models.factory import create_model_from_config

    model = create_model_from_config(model_config)
    model_type = model_config["model_type"]
    if model_type in ("diffusion_cond", "diffusion_cond_inpaint"):
        from stable_audio_tools_tpu.io.torch_mapping import (
            import_diffusion_cond_state_dict,
        )

        variables = import_diffusion_cond_state_dict(model, sd)
    elif model_type == "autoencoder":
        from stable_audio_tools_tpu.io.checkpoints import (
            import_autoencoder_state_dict,
        )

        variables = import_autoencoder_state_dict(model, sd)
    else:
        raise NotImplementedError(
            f"rehearsal supports diffusion_cond/autoencoder, got {model_type}")

    # Merge the imported subtrees over an init template and report coverage
    # loudly — a published bundle must cover every param; anything missing
    # means a layout-detection gap, not something to random-init silently.
    from stable_audio_tools_tpu.io.checkpoints import flatten_params
    from stable_audio_tools_tpu.models.handle import init_variables_from_config

    template = init_variables_from_config(model, model_config, 0)
    merged = {}
    n_missing = 0
    for col in template:
        t_flat = flatten_params(template[col])
        i_flat = flatten_params(variables.get(col, {}))
        out_flat = {}
        for k, tv in t_flat.items():
            iv = i_flat.get(k)
            if iv is None:
                n_missing += 1
                if n_missing <= 10:
                    print(f"[rehearsal] MISSING from bundle: {col}/{k} "
                          f"{tuple(tv.shape)}")
                out_flat[k] = tv
            else:
                assert tuple(iv.shape) == tuple(tv.shape), (
                    f"shape mismatch for {col}/{k}: bundle {tuple(iv.shape)} "
                    f"vs model {tuple(tv.shape)}")
                out_flat[k] = iv
        from stable_audio_tools_tpu.io.checkpoints import unflatten_params

        merged[col] = unflatten_params(out_flat)
    if n_missing:
        print(f"[rehearsal] WARNING: {n_missing} tensors missing from the "
              "bundle (kept at init values) — activation asserts will catch "
              "any that matter")
    return model, merged


def denoiser_eval(model, variables, fx):
    """Run the imported denoiser on fixture inputs → output array."""
    import jax.numpy as jnp

    cond_tensors = {}
    for k in fx.files:
        if k.startswith("cond_tensor:"):
            key = k.split(":", 1)[1]
            mask = fx.get(f"cond_mask:{key}")
            cond_tensors[key] = (
                jnp.asarray(fx[k]),
                None if mask is None else jnp.asarray(mask),
            )
    import numpy as np

    out = model.apply(
        variables, jnp.asarray(fx["x"]), jnp.asarray(fx["t"]),
        cond_tensors=cond_tensors or None,
    )
    return np.asarray(out)


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    model_config, sd = load_bundle(args.dir)
    model_type = model_config["model_type"]
    print(f"[rehearsal] bundle {args.dir}: {model_type}, "
          f"{len(sd)} tensors")
    model, variables = import_model(model_config, sd)
    n_imported = sum(
        x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"[rehearsal] imported {n_imported:,} params")

    fixtures = args.fixtures
    if fixtures is None:
        default_fx = os.path.join(args.dir, "activation_fixtures.npz")
        fixtures = default_fx if os.path.exists(default_fx) else None

    sample_rate = model_config["sample_rate"]
    if model_type in ("diffusion_cond", "diffusion_cond_inpaint"):
        if fixtures:
            fx = np.load(fixtures)
            out = denoiser_eval(model, variables, fx)
            rtol = float(fx.get("rtol", 1e-4))
            atol = float(fx.get("atol", 1e-4))
            np.testing.assert_allclose(out, fx["expected_output"],
                                       rtol=rtol, atol=atol)
            print(f"[rehearsal] activation fixtures OK "
                  f"({fixtures}, rtol={rtol}, atol={atol})")
        if args.save_fixtures:
            io_ch = model.io_channels
            ratio = (model.pretransform.downsampling_ratio
                     if model.pretransform is not None else 1)
            T = max(model.min_input_length // ratio, 64)
            rs = np.random.RandomState(0)
            x = rs.randn(1, io_ch, T).astype(np.float32)
            t = np.full((1,), 0.5, np.float32)
            from stable_audio_tools_tpu.inference.generation import (
                compute_conditioning_tensors,
            )

            cond_tensors = compute_conditioning_tensors(
                model, variables,
                [{"prompt": args.prompt, "seconds_start": 0,
                  "seconds_total": args.seconds}],
            )
            arrays = {"x": x, "t": t, "rtol": 1e-4, "atol": 1e-4}
            for key, (ten, mask) in cond_tensors.items():
                arrays[f"cond_tensor:{key}"] = np.asarray(ten)
                if mask is not None:
                    arrays[f"cond_mask:{key}"] = np.asarray(mask)
            import jax.numpy as jnp

            arrays["expected_output"] = np.asarray(model.apply(
                variables, jnp.asarray(x), jnp.asarray(t),
                cond_tensors={k: (jnp.asarray(a), None if m is None
                                  else jnp.asarray(m))
                              for k, (a, m) in cond_tensors.items()},
            ))
            np.savez(args.save_fixtures, **arrays)
            print(f"[rehearsal] fixtures saved to {args.save_fixtures}")

        from stable_audio_tools_tpu.inference.generation import (
            generate_diffusion_cond,
        )

        ratio = (model.pretransform.downsampling_ratio
                 if model.pretransform is not None else 1)
        sample_size = int(args.seconds * sample_rate)
        sample_size = max(ratio, (sample_size // ratio) * ratio)
        audio = generate_diffusion_cond(
            model, variables, steps=args.steps, cfg_scale=args.cfg_scale,
            conditioning=[{"prompt": args.prompt, "seconds_start": 0,
                           "seconds_total": args.seconds}],
            sample_size=sample_size, seed=42,
        )
        audio = np.asarray(audio)
        assert np.all(np.isfinite(audio)), "generated audio has NaN/Inf"
    else:  # autoencoder roundtrip
        t = np.arange(int(args.seconds * sample_rate)) / sample_rate
        tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        ch = model_config.get("audio_channels", 2)
        audio_in = np.tile(tone[None], (ch, 1))[None]
        import jax.numpy as jnp

        latents = model.apply(
            variables, jnp.asarray(audio_in), method=model.encode,
            rngs={"sample": jax.random.PRNGKey(0)})
        audio = np.asarray(model.apply(variables, latents, method=model.decode))
        if fixtures:
            fx = np.load(fixtures)
            np.testing.assert_allclose(
                np.asarray(latents), fx["expected_latents"],
                rtol=float(fx.get("rtol", 1e-4)),
                atol=float(fx.get("atol", 1e-4)))
            print("[rehearsal] AE latent fixtures OK")
        assert np.all(np.isfinite(audio))

    from stable_audio_tools_tpu.data.wav import save_wav

    peak = np.abs(audio).max() or 1.0
    save_wav(args.out, audio[0] / peak * 0.95, sample_rate)
    print(f"[rehearsal] wrote {audio.shape[-1] / sample_rate:.2f}s of audio "
          f"to {args.out}")


if __name__ == "__main__":
    main()
