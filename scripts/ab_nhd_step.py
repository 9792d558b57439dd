"""A/B the head-pair NHD attention dispatch at the SA-Open bench config.

Round-5 recorded results (hard sync, one process per config):
- seq 1024 (SA-Open): NHD 33.06 vs standard 31.38 ms/step — NHD LOSES;
  the head-split transposes it removes are cheaper than its in-VMEM lane
  splits at short N. Gate: ops/attention.py::_should_use_nhd.
- seq 6144 (SA-2.0, pass 12582912): NHD 316.76 ms/step; the standard
  BHND path DOES NOT COMPILE at this scale (scoped-VMEM OOM in the
  prefix-split kernel: 23.49M > 16M) — NHD is the only option, not just
  the faster one. The disabled arm's compile error is reported, not
  fatal.

Measures the SAMPLER PER-STEP time (two-point method: steps=N1 vs N2 walls,
slope = per-step) for NHD enabled vs disabled in ONE process on one chip —
eliminating run-to-run chip variance that whole-bench A/Bs suffer (±10%).
Hard host-transfer sync.
Usage: python scripts/ab_nhd_step.py [sample_size]
  (default bench.SAMPLE_SIZE=2097152/seq1024; pass 12582912 for the SA-2.0
  seq-6144 regime)
"""
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
argv = sys.argv[1:]
sys.argv = [sys.argv[0]]

import bench  # noqa: E402  (reuses the shipped bench model builder)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N1, N2 = 40, 100
SAMPLE_SIZE = int(argv[0]) if argv else None


def main():
    from stable_audio_tools_tpu.inference.generation import generate_diffusion_cond
    from stable_audio_tools_tpu.models.factory import create_model_from_config

    np.asarray(jax.block_until_ready(jnp.zeros(())))
    ss = SAMPLE_SIZE or bench.SAMPLE_SIZE
    cfg = bench.CONFIG
    if ss > bench.SAMPLE_SIZE:
        # long-context regimes can't decode in one conv program (HBM);
        # use the chunked overlap-paste codec like trace_sa2_generate
        import copy

        cfg = copy.deepcopy(bench.CONFIG)
        cfg["model"]["pretransform"]["chunked"] = True
    model = create_model_from_config(cfg)
    mc = model._multi_conditioner
    conditioning = [{"prompt": "An upbeat electronic track", "seconds_start": 0,
                     "seconds_total": ss / 44100.0}]
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(conditioning))
    # init at a short length through the NON-chunked twin (param shapes are
    # length-independent; init can't trace inside the chunk scan, and a
    # full-length init_full decode would OOM at long ss)
    init_model = (model if cfg is bench.CONFIG
                  else create_model_from_config(bench.CONFIG))
    x = jnp.zeros((1, bench.DIT["io_channels"],
                   min(ss // bench.DOWN, 1024)), jnp.float32)
    t = jnp.ones((1,))
    variables = jax.jit(lambda x, t: init_model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, t, cond=prepared, method=init_model.init_full))(x, t)
    jax.block_until_ready(variables)

    def run(steps, seed):
        a = generate_diffusion_cond(
            model, variables, steps=steps, cfg_scale=6.0,
            conditioning=conditioning, batch_size=1,
            sample_size=ss, seed=seed,
            sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500.0)
        np.asarray(a[0, 0, 0])  # hard sync

    def per_step(tag):
        walls = {}
        for steps in (N1, N2):
            run(steps, 0)          # compile (fresh trace reads the env gate)
            ws = []
            for r in (1, 2, 3):
                t0 = time.time(); run(steps, r); ws.append(time.time() - t0)
            walls[steps] = min(ws)
        ps = (walls[N2] - walls[N1]) / (N2 - N1)
        print(f"{tag}: wall{N1}={walls[N1]:.3f}s wall{N2}={walls[N2]:.3f}s "
              f"-> {ps*1e3:.2f} ms/step", flush=True)
        return ps

    os.environ.pop("SAT_DISABLE_NHD", None)
    ps_on = per_step("NHD enabled ")
    os.environ["SAT_DISABLE_NHD"] = "1"
    # bust the generation program cache so the gate is re-read at trace time
    if hasattr(model, "_gen_jit_cache"):
        model._gen_jit_cache.clear()
    try:
        ps_off = per_step("NHD disabled")
    except Exception as e:  # noqa: BLE001
        # at seq 6144 the standard BHND prefix-split kernel exceeds scoped
        # VMEM (23.49M > 16M) and cannot compile — NHD is the only option
        print(f"NHD disabled: DOES NOT COMPILE at this scale "
              f"({type(e).__name__}: {str(e)[:200]})")
        return
    print(f"delta: {1e3*(ps_off - ps_on):+.2f} ms/step "
          f"({'NHD faster' if ps_on < ps_off else 'NHD slower'})")


if __name__ == "__main__":
    main()
