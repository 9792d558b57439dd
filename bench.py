"""Benchmark: stable-audio-open-style text-to-audio throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures audio-seconds-generated per wall-clock second per chip for the
flagship config (latent DiT + frozen VAE decode), 100 sampler steps with CFG
(200 model evals), matching BASELINE.json config (c). The reference publishes
no numbers (BASELINE.md); vs_baseline is measured against this project's
north-star target of 47 s stereo in <2 s on v5e-8 ⇒ 23.78 audio-sec/sec/chip
per 8-chip pod ⇒ ~2.97 audio-sec/sec on ONE chip at linear scaling.
"""

import json
import os
import sys
import threading
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# Watchdog: a wedged device tunnel can block backend init forever, which
# would hang the whole bench run. Emit an error JSON line and exit instead.
_WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", 2400))
_done = threading.Event()


def _watchdog():
    if not _done.wait(_WATCHDOG_S):
        print(json.dumps({
            "metric": "sa_open_audio_sec_per_sec_per_chip", "value": 0.0,
            "unit": "audio-sec/sec/chip",
            "error": f"bench watchdog fired after {_WATCHDOG_S:.0f}s "
                     "(device backend unavailable?)",
        }), flush=True)
        os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

import jax
import jax.numpy as jnp
import numpy as np

SMALL = "--small" in sys.argv
INLINE = "--inline" in sys.argv  # r1-identical workload for A/B comparisons

# SA-Open-1.0 proportions (configs/model_configs/txt2audio/stable_audio_open
# in the reference): DiT depth 24 width 1536, latent 64ch @ 2048x VAE.
# Scaled per chip budget; --small for CI smoke.
if SMALL:
    SAMPLE_SIZE = 2 ** 16
    DIT = {"io_channels": 16, "embed_dim": 128, "depth": 2, "num_heads": 4,
           "cond_token_dim": 128, "use_checkpointing": False,
           "compute_dtype": "bfloat16"}
    VAE_CH, VAE_MULTS, VAE_STRIDES = 16, [1, 2], [8, 8]
    DOWN = 64
    LATENT = 16
    STEPS = 8
else:
    SAMPLE_SIZE = 2097152  # ≈47.55 s @ 44.1 kHz
    DIT = {"io_channels": 64, "embed_dim": 1536, "depth": 24, "num_heads": 24,
           "cond_token_dim": 768, "use_checkpointing": False,
           "compute_dtype": "bfloat16"}
    VAE_CH, VAE_MULTS, VAE_STRIDES = 128, [1, 2, 4, 8, 16], [2, 4, 4, 8, 8]
    DOWN = 2048
    LATENT = 64
    STEPS = 100


def _full_config():
    """The SHIPPED stable_audio_open_1_0.json — real T5-base conditioning
    stack (random-init tower in this offline image: identical compute cost),
    global conds, full VAE. BASELINE.md config (c) verbatim."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "stable_audio_tools_tpu/configs/model_configs/txt2audio/"
        "stable_audio_open_1_0.json",
    )
    with open(path) as f:
        cfg = json.load(f)
    for c in cfg["model"]["conditioning"]["configs"]:
        if c["type"] == "t5":
            c["config"]["allow_random_init"] = True
    return cfg


CONFIG = {
    "model_type": "diffusion_cond",
    "sample_size": SAMPLE_SIZE,
    "sample_rate": 44100,
    "audio_channels": 2,
    "model": {
        "pretransform": {
            "type": "autoencoder",
            "model_half": True,
            "config": {
                "encoder": {"type": "oobleck", "config": {
                    "in_channels": 2, "channels": VAE_CH, "c_mults": VAE_MULTS,
                    "strides": VAE_STRIDES, "latent_dim": LATENT * 2,
                    "use_snake": True}},
                "decoder": {"type": "oobleck", "config": {
                    "out_channels": 2, "channels": VAE_CH, "c_mults": VAE_MULTS,
                    "strides": VAE_STRIDES, "latent_dim": LATENT,
                    "use_snake": True}},
                "bottleneck": {"type": "vae"},
                "latent_dim": LATENT,
                "downsampling_ratio": DOWN,
                "io_channels": 2,
            },
        },
        "conditioning": {
            "configs": [
                {"id": "seconds_total", "type": "number",
                 "config": {"min_val": 0, "max_val": 512}},
            ],
            "cond_dim": DIT["cond_token_dim"],
        },
        "diffusion": {
            "cross_attention_cond_ids": ["seconds_total"],
            "type": "dit",
            "diffusion_objective": "v",
            "config": DIT,
        },
        "io_channels": DIT["io_channels"],
    },
}
if not SMALL and not INLINE:
    CONFIG = _full_config()


def main():
    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.inference.generation import generate_diffusion_cond

    # warm up the axon device<->host path (first transfer can block minutes)
    np.asarray(jax.block_until_ready(jnp.zeros(())))

    model = create_model_from_config(CONFIG)
    mc = model._multi_conditioner
    conditioning = [{"seconds_total": SAMPLE_SIZE / 44100.0}]
    if not SMALL:
        conditioning = [{
            "prompt": "An upbeat electronic track with a driving bassline",
            "seconds_start": 0,
            "seconds_total": SAMPLE_SIZE / 44100.0,
        }]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(conditioning))

    latent_T = SAMPLE_SIZE // DOWN
    x = jnp.zeros((1, DIT["io_channels"], latent_T), jnp.float32)
    t = jnp.ones((1,))
    variables = jax.jit(
        lambda x, t: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x, t, cond=prepared, method=model.init_full,
        )
    )(x, t)
    jax.block_until_ready(variables)

    def run(seed):
        return generate_diffusion_cond(
            model, variables,
            steps=STEPS, cfg_scale=6.0, conditioning=conditioning,
            batch_size=1, sample_size=SAMPLE_SIZE, seed=seed,
            sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500.0,
        )

    def sync(a):
        # block_until_ready is not a reliable device fence on the axon
        # backend (docs/performance.md); a host transfer is the only sync
        np.asarray(jax.device_get(a.ravel()[0]))

    # compile + warmup
    audio = run(0)
    sync(audio)
    # timed runs
    n_runs = 3
    t0 = time.time()
    for i in range(1, n_runs + 1):
        audio = run(i)
        sync(audio)
    wall = (time.time() - t0) / n_runs

    audio_seconds = SAMPLE_SIZE / 44100.0
    value = audio_seconds / wall
    target_per_chip = 23.775 / 8  # north-star: 47.55s in <2s on v5e-8
    _done.set()
    # weight provenance: "fixture"/"hub" = real T5 weights; "random-init" =
    # architecture-exact random tower (identical compute; populate
    # fixtures/t5 via scripts/fetch_t5_fixture.py where network exists)
    t5_src = "none"
    mc = getattr(model, "_multi_conditioner", None)
    if mc is not None:
        for c in getattr(mc, "conditioners", {}).values():
            src = getattr(c, "loaded_from", None)
            if src:
                t5_src = src
    print(json.dumps({
        "metric": "audio_sec_generated_per_sec_per_chip",
        "value": round(value, 4),
        "unit": f"audio-sec/sec (SA-Open-scale DiT, {STEPS} steps dpmpp-3m-sde + VAE decode, {audio_seconds:.1f}s stereo 44.1kHz)",
        "vs_baseline": round(value / target_per_chip, 4),
        "t5_weights": t5_src,
    }))


if __name__ == "__main__":
    main()
