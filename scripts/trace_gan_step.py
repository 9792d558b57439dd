"""Trace the SA-2.0 VAE GAN train-step pair (BASELINE config d) for the
per-op profile behind the roofline accounting in docs/performance.md.

Same measurement setup as scripts/bench_gan_step.py (batch 4 x 0.74 s,
one train state alive); writes a jax.profiler trace of N gen+disc pairs.
Analyze with: python scripts/profile_ops.py <trace_dir>

Usage: python scripts/trace_gan_step.py [/tmp/gan_trace] [n_pairs]
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
from stable_audio_tools_tpu.training.factory import (
    create_training_wrapper_from_config,
)

BATCH, SAMPLES = 4, 32768


def main(trace_dir, n_pairs):
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
        state, _ = trainer.train_step(
            state, reals, jax.random.fold_in(rng, 2 * i), 2 * i)
        state, _ = trainer.train_step(
            state, reals, jax.random.fold_in(rng, 2 * i + 1), 2 * i + 1)
        return state

    state = jax.block_until_ready(pair(state, 0))  # compile both phases
    t0 = time.time()
    for i in range(1, 4):
        state = pair(state, i)
    state = jax.block_until_ready(state)
    print(f"pair wall: {(time.time() - t0) / 3 * 1000:.1f} ms")

    with jax.profiler.trace(trace_dir):
        for i in range(4, 4 + n_pairs):
            state = pair(state, i)
        state = jax.block_until_ready(state)
    print("trace written to", trace_dir)


if __name__ == "__main__":
    td = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gan_trace"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(td, n)
