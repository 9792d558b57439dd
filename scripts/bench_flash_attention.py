"""Benchmark Pallas flash-attention fwd/bwd vs XLA SDPA on the real chip.

Usage: python scripts/bench_flash_attention.py [--seq 4096] [--heads 16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


ITERS = 20  # scaled up for small problems in main(): ITERS*t_op must ≫ the
# ~25 ms axon per-call RPC floor or the measurement is all dispatch overhead


def timeit(fn, *args, repeats=3, iters=None):
    """Time fn amortized over in-jit iterations (the axon backend has a
    ~25 ms per-call RPC floor that would otherwise dominate)."""
    ITERS = iters or globals()["ITERS"]

    def loop(*a):
        def body(c, _):
            out = fn(c, *a[1:])
            # feed a scalar back into the carry to serialize iterations
            leaves = jax.tree_util.tree_leaves(out)
            bump = sum(jnp.sum(l).astype(jnp.float32) for l in leaves) * 1e-20
            return a[0] + bump.astype(a[0].dtype), None

        c, _ = jax.lax.scan(body, a[0], None, length=ITERS)
        return c

    jloop = jax.jit(loop)

    def sync(out):
        # block_until_ready is not a true device sync on the axon backend —
        # force a host transfer of one scalar to serialize timing.
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    sync(jloop(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(jloop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    from stable_audio_tools_tpu.ops.attention import dot_product_attention
    from stable_audio_tools_tpu.ops.kernels import flash_attention as fa

    B, H, N, D = args.batch, args.heads, args.seq, args.dim
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    np.asarray(jnp.zeros(()))  # warm up d2h

    for label, kw in [("full", dict(causal=False, window=None)),
                      ("causal", dict(causal=True, window=None)),
                      ("window[63,64]", dict(causal=False, window=(63, 64)))]:
        loss_flash = jax.jit(lambda q, k, v, kw=kw: jnp.sum(
            fa.flash_attention(q, k, v, kw["causal"], kw["window"]).astype(jnp.float32) ** 2))
        loss_xla = jax.jit(lambda q, k, v, kw=kw: jnp.sum(
            dot_product_attention(q, k, v, causal=kw["causal"], window=kw["window"]).astype(jnp.float32) ** 2))
        # amortize the ~25 ms per-call RPC floor: more in-jit iterations for
        # small problems so ITERS * t_op dominates dispatch
        n_it = max(ITERS, min(400, int(4e12 // max(B * H * N * N * D, 1))))
        fwd_flash = timeit(loss_flash, q, k, v, iters=n_it)
        fwd_xla = timeit(loss_xla, q, k, v, iters=n_it)
        g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
        g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
        bwd_flash = timeit(g_flash, q, k, v, iters=n_it)
        bwd_xla = timeit(g_xla, q, k, v, iters=n_it)
        print(f"{label:14s} fwd {fwd_flash*1e3:7.2f} ms (XLA {fwd_xla*1e3:7.2f}, "
              f"{fwd_xla/fwd_flash:4.2f}x) | fwd+bwd {bwd_flash*1e3:7.2f} ms "
              f"(XLA {bwd_xla*1e3:7.2f}, {bwd_xla/bwd_flash:4.2f}x)")

        # correctness spot check vs XLA in f32
        gf = g_flash(q, k, v)
        gx = g_xla(q, k, v)
        err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                  for a, b in zip(gf, gx))
        print(f"{'':14s} max grad abs err vs XLA: {err:.3e}")


if __name__ == "__main__":
    main()
