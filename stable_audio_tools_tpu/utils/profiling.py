"""Tracing / profiling utilities (SURVEY.md §5.1 rebuild target).

The reference has only an ad-hoc wall-clock Profiler (models/diffusion.py:20-35);
here: the same phase-tick profiler, plus jax.profiler trace integration and
compile-time reporting. Combined with `nan_guard` (SURVEY §5.2 posture:
functional purity + explicit NaN checks).
"""

from __future__ import annotations

import contextlib
import time
import typing as tp

import jax
import jax.numpy as jnp


class Profiler:
    """Phase wall-clock ticks (reference Profiler: models/diffusion.py:20-35)."""

    def __init__(self):
        self.ticks = [[time.time(), None]]

    def tick(self, msg):
        self.ticks.append([time.time(), msg])

    def __repr__(self):
        rep = ["%.3f" % (self.ticks[-1][0] - self.ticks[0][0]) + "s total"]
        for i in range(1, len(self.ticks)):
            rep.append(
                "%.3f" % (self.ticks[i][0] - self.ticks[i - 1][0])
                + "s: " + str(self.ticks[i][1])
            )
        return "\n".join(rep)


@contextlib.contextmanager
def trace(name: str, log_dir: tp.Optional[str] = None):
    """jax.profiler trace region; with log_dir, writes a TensorBoard trace."""
    if log_dir is not None:
        jax.profiler.start_trace(log_dir)
        try:
            with jax.profiler.TraceAnnotation(name):
                yield
        finally:
            jax.profiler.stop_trace()
    else:
        with jax.profiler.TraceAnnotation(name):
            yield


def annotate(name: str):
    """Decorator adding a named trace annotation to a function."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco


def compile_report(fn, *args, **kwargs) -> dict:
    """Trace/compile timing + cost analysis for a jittable fn."""
    t0 = time.time()
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args, **kwargs)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    cost = {}
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        cost = {k: analysis[k] for k in ("flops", "bytes accessed")
                if k in analysis}
    except Exception:
        pass
    return {"lower_s": t_lower, "compile_s": t_compile, **cost}


def nan_guard(tree, name: str = "tree", raise_on_nan: bool = True):
    """Check a pytree for NaN/Inf leaves (host-side, after block_until_ready)."""
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append("/".join(str(getattr(p, "key", p)) for p in path))
    if bad and raise_on_nan:
        raise FloatingPointError(f"NaN/Inf in {name}: {bad[:10]}")
    return bad


def enable_nan_debugging():
    """Global jax NaN debugging (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", True)
