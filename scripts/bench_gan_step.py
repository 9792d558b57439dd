"""Benchmark the SA-2.0 VAE GAN train step (BASELINE config d).

Builds the shipped stable_audio_2_0_vae.json, runs gen+disc step pairs on
batch 4 x 32768 samples (0.74 s @ 44.1 kHz) and prints ms per gen+disc pair.
Matches the measurement behind docs/performance.md's GAN-step rows (keep ONE
train state alive; warm the axon d2h path first).
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

from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config

BATCH, SAMPLES = 4, 32768


def main():
    np.asarray(jax.block_until_ready(jnp.zeros(())))
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "stable_audio_tools_tpu/configs/model_configs/autoencoders/"
        "stable_audio_2_0_vae.json",
    )
    with open(cfg_path) as f:
        cfg = json.load(f)
    model = create_model_from_config(cfg)
    trainer = create_training_wrapper_from_config(cfg, model)

    reals = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, 2, SAMPLES) * 0.1, jnp.float32
    )
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, reals)
    state = jax.block_until_ready(state)

    def pair(state, i):
        state, gen_logs = trainer.train_step(state, reals, jax.random.fold_in(rng, 2 * i), 2 * i)
        state, disc_logs = trainer.train_step(state, reals, jax.random.fold_in(rng, 2 * i + 1), 2 * i + 1)
        return state, (gen_logs, disc_logs)

    def sync(state):
        # block_until_ready is not a device fence on the axon backend; a
        # host transfer is the only reliable sync (docs/performance.md)
        leaf = jax.tree_util.tree_leaves(state)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    # compile both phase programs
    state, logs = pair(state, 0)
    sync(state)

    n = 10
    t0 = time.time()
    for i in range(1, n + 1):
        state, logs = pair(state, i)
    sync(state)
    ms = (time.time() - t0) / n * 1000
    audio_sec = BATCH * SAMPLES / 44100.0
    print(json.dumps({
        "metric": "sa2_vae_gan_step_pair_ms", "value": round(ms, 1),
        "unit": f"ms per gen+disc pair (batch {BATCH}x{SAMPLES/44100.0:.2f}s)",
        "audio_sec_per_sec": round(audio_sec / (ms / 1000), 2),
    }))


if __name__ == "__main__":
    main()
