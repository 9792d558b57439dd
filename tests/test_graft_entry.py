"""Driver entry points must keep working (compile-check + multichip dryrun)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    # run in a subprocess: dryrun pins jax to CPU pre-backend-init
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "OK" in result.stdout


@pytest.mark.slow
def test_bench_small_runs():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; sys.argv.append('--small');"
         "exec(open('bench.py').read())"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    import json

    line = [l for l in result.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "audio_sec_generated_per_sec_per_chip"
    assert rec["value"] > 0
