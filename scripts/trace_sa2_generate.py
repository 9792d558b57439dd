"""Trace the SA-2.0-scale generate (seq 6144, 285 s stereo) — the regime
VERDICT r2 flagged as worse-than-linear. Reuses bench.py's model/config but
overrides sample_size to the SA-2.0 context (12,582,912 samples @ 2048x).

Usage: python scripts/trace_sa2_generate.py [/tmp/sa2_trace] [steps]
"""
import sys

sys.path.insert(0, ".")
argv = sys.argv[1:]
sys.argv = [sys.argv[0]]

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SAMPLE_SIZE = 12582912  # ≈285.3 s @ 44.1 kHz (SA-2.0 config)


def main(trace_dir, steps):
    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.inference.generation import generate_diffusion_cond

    np.asarray(jax.block_until_ready(jnp.zeros(())))
    import copy

    cfg = copy.deepcopy(bench.CONFIG)
    # 285 s of audio cannot decode in one conv program (HBM); use the
    # chunked overlap-paste codec exactly like the r1/r2 SA-2.0 rows
    cfg["model"]["pretransform"]["chunked"] = True
    model = create_model_from_config(cfg)
    # init through the NON-chunked twin: param creation can't happen inside
    # the chunk scan (tracer leak); the param tree is identical
    init_model = create_model_from_config(bench.CONFIG)
    mc = model._multi_conditioner
    conditioning = [{
        "prompt": "An upbeat electronic track with a driving bassline",
        "seconds_start": 0,
        "seconds_total": SAMPLE_SIZE / 44100.0,
    }]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(conditioning))
    # init at a SHORT length through the non-chunked twin: param shapes are
    # length-independent, and init_full's single-program decode of the full
    # 12.5M-sample latent would OOM HBM
    x = jnp.zeros((1, bench.DIT["io_channels"], 1024), jnp.float32)
    t = jnp.ones((1,))
    variables = jax.jit(
        lambda x, t: init_model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x, t, cond=prepared, method=init_model.init_full,
        )
    )(x, t)
    jax.block_until_ready(variables)

    def run(seed):
        return generate_diffusion_cond(
            model, variables,
            steps=steps, cfg_scale=6.0, conditioning=conditioning,
            batch_size=1, sample_size=SAMPLE_SIZE, seed=seed,
            sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500.0,
        )

    import time
    audio = run(0)
    _ = np.asarray(audio[0, 0, 0])  # compile + sync
    t0 = time.time()
    audio = run(1)
    _ = np.asarray(audio[0, 0, 0])
    wall = time.time() - t0
    # separate the per-step sampler cost from the fixed decode cost with a
    # second step count (scaling the whole wall by steps overcounted the
    # decode 10x and understated throughput)
    def run_n(seed, n):
        return generate_diffusion_cond(
            model, variables, steps=n, cfg_scale=6.0,
            conditioning=conditioning, batch_size=1,
            sample_size=SAMPLE_SIZE, seed=seed,
            sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500.0)

    half = max(2, steps // 2)
    a2 = run_n(3, half)
    _ = np.asarray(a2[0, 0, 0])
    t0 = time.time()
    a2 = run_n(4, half)
    _ = np.asarray(a2[0, 0, 0])
    wall_half = time.time() - t0
    per_step = (wall - wall_half) / (steps - half)
    fixed = max(wall - per_step * steps, 0.0)
    w100 = per_step * 100 + fixed
    print(f"wall per generate ({steps} steps): {wall:.3f}s; "
          f"sampler {per_step*1e3:.1f} ms/step, fixed (cond+decode) "
          f"{fixed:.2f}s -> {SAMPLE_SIZE/44100.0/w100:.2f} "
          "audio-sec/sec at 100 steps")
    with jax.profiler.trace(trace_dir):
        audio = run(2)
        _ = np.asarray(audio[0, 0, 0])
    print("trace written to", trace_dir)


if __name__ == "__main__":
    td = argv[0] if argv else "/tmp/sa2_trace"
    st = int(argv[1]) if len(argv) > 1 else 10
    main(td, st)
