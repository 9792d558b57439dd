"""Benchmark BASELINE config (b): small unconditional diffusion sampling.

Dance Diffusion 1-D UNet (shipped dance_diffusion_base_16k.json — the
reference's dance-diffusion family, stable_audio_tools/models/adp.py is
NOT this; see models/dance_unet.py), 4.1 s @ 16 kHz, 100 dpmpp-2m-sde
steps, one v5e chip, hard host-transfer sync. Prints one JSON line.

Usage: python scripts/bench_dance_uncond.py [steps]
"""
import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def main():
    from stable_audio_tools_tpu.inference.generation import (
        generate_diffusion_uncond)
    from stable_audio_tools_tpu.models.factory import create_model_from_config

    np.asarray(jax.block_until_ready(jnp.zeros(())))
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "stable_audio_tools_tpu/configs/model_configs/dance_diffusion/"
        "dance_diffusion_base_16k.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    model = create_model_from_config(cfg)
    ss, sr = cfg["sample_size"], cfg["sample_rate"]
    x = jnp.zeros((1, cfg["model"]["config"]["io_channels"], ss), jnp.float32)
    t = jnp.ones((1,))
    variables = jax.jit(lambda x, t: model.init(
        {"params": jax.random.PRNGKey(0)}, x, t))(x, t)
    jax.block_until_ready(variables)

    def run(seed):
        return generate_diffusion_uncond(
            model, variables, steps=STEPS, batch_size=1, sample_size=ss,
            seed=seed, sampler_type="dpmpp-2m-sde")

    def sync(a):
        np.asarray(jax.device_get(jnp.ravel(a)[0]))

    sync(run(0))  # compile + warm
    n = 3
    t0 = time.time()
    for i in range(1, n + 1):
        sync(run(i))
    wall = (time.time() - t0) / n
    audio_sec = ss / sr
    print(json.dumps({
        "metric": "dance_uncond_audio_sec_per_sec",
        "value": round(audio_sec / wall, 2),
        "unit": f"audio-sec/sec (DAU1d base, {STEPS} steps dpmpp-2m-sde, "
                f"{audio_sec:.1f}s stereo {sr/1000:.0f}kHz)",
        "wall_s": round(wall, 3),
    }))


if __name__ == "__main__":
    main()
