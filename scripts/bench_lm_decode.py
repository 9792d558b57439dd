"""Benchmark the KV-cached LM decode loop (MusicGen-small scale).

Usage: python scripts/bench_lm_decode.py [--tokens 500] [--cfg 3.0]

Measures ms/token of `lm_generate_cached` on the current default backend
with the musicgen_small_rvq.json backbone (1024d x 24L, bf16 compute) and a
synthetic 128-token T5-base conditioning tensor. The conditioner tower and
codec decode are excluded: this times the AR scan that dominates wall-clock.
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=500)
    ap.add_argument("--cfg", type=float, default=3.0)
    ap.add_argument("--cond-len", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight-only decode (weight_quant='int8')")
    args = ap.parse_args()

    from stable_audio_tools_tpu.models.lm import (
        create_audio_lm_from_config, lm_generate_cached,
    )

    with open("stable_audio_tools_tpu/configs/model_configs/lm/"
              "musicgen_small_rvq.json") as f:
        config = json.load(f)
    config = copy.deepcopy(config)
    # skip the T5 tower (times the AR scan only); feed its output shape directly
    config["model"].pop("conditioning", None)

    model = create_audio_lm_from_config(config)
    rng = jax.random.PRNGKey(0)
    seq = jnp.zeros((1, model.num_quantizers, 8), jnp.int32)
    cond_dim = config["model"]["lm"]["config"]["cross_attn_cond_dim"]
    cond = {
        "prompt": (
            jax.random.normal(rng, (1, args.cond_len, cond_dim)) * 0.1,
            jnp.ones((1, args.cond_len), bool),
        )
    }
    variables = model.init(rng, seq, cond_tensors=cond)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"params: {n_params/1e6:.0f}M, backend: {jax.default_backend()}")

    # warm up device transfers before timing (axon tunnel gotcha)
    np.asarray(jnp.zeros(()))

    def run():
        out = lm_generate_cached(
            model, variables, conditioning_tensors=cond,
            max_gen_len=args.tokens, cfg_scale=args.cfg,
            rng=jax.random.PRNGKey(1),
            weight_quant="int8" if args.int8 else None,
        )
        jax.block_until_ready(out)
        return out

    t0 = time.perf_counter()
    run()
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    ms_tok = best * 1000 / args.tokens
    print(json.dumps({
        "metric": "lm_decode_ms_per_token", "value": round(ms_tok, 3),
        "unit": "ms/token", "tokens_per_s": round(args.tokens / best, 1),
        "cfg": args.cfg, "tokens": args.tokens,
    }))


if __name__ == "__main__":
    main()
