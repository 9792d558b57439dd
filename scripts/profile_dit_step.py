"""Profile ONE SA-Open-scale DiT denoiser eval (CFG-doubled batch) on TPU.

Builds the DiT exactly at stable_audio_open_1_0 proportions (24x1536,
24 heads, cond_token_dim 768, 1024 latent tokens + 1 prepended global
token), jits the forward, and either times it or writes a jax.profiler
trace for scripts/profile_ops.py.

Usage:
    python scripts/profile_dit_step.py            # wall time only
    python scripts/profile_dit_step.py /tmp/tr    # also write a trace
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from stable_audio_tools_tpu.models.dit import DiffusionTransformer  # noqa: E402

B, T, COND_T = 2, 1024, 64

model = DiffusionTransformer(
    io_channels=64, embed_dim=1536, depth=24, num_heads=24,
    cond_token_dim=768, global_cond_dim=1536,
    compute_dtype="bfloat16",
)

x = jnp.zeros((B, 64, T), jnp.float32)
t = jnp.ones((B,))
cond = jnp.zeros((B, COND_T, 768), jnp.float32)
gl = jnp.zeros((B, 1536), jnp.float32)

variables = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0)}, x, t, cross_attn_cond=cond,
    global_embed=gl,
)
jax.block_until_ready(variables)


@jax.jit
def step(variables, x, t, cond, gl):
    return model.apply(variables, x, t, cross_attn_cond=cond, global_embed=gl)


def sync(v):
    # True device sync on the axon backend: block_until_ready returns before
    # the device is actually drained there; a host transfer is the only fence.
    np.asarray(jax.device_get(v.ravel()[0]))


out = step(variables, x, t, cond, gl)
sync(out)
print("out", out.shape, out.dtype)

N = 30
t0 = time.time()
for _ in range(N):
    out = step(variables, x, t, cond, gl)
sync(out)
wall = (time.time() - t0) / N
print(f"denoiser eval: {wall*1e3:.2f} ms")

if len(sys.argv) > 1:
    trace_dir = sys.argv[1]
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            out = step(variables, x, t, cond, gl)
        jax.block_until_ready(out)
    print("trace written to", trace_dir)
