import json, time
import numpy as np
import jax, jax.numpy as jnp
from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config

cfg = json.load(open("stable_audio_tools_tpu/configs/model_configs/autoencoders/stable_audio_2_0_vae.json"))
model = create_model_from_config(cfg)
trainer = create_training_wrapper_from_config(cfg, model)
B, T = 4, 32768
batch = jnp.zeros((B, 2, T), jnp.float32)
rng = jax.random.PRNGKey(0)
state = trainer.init_state(rng, batch)
np.asarray(jnp.zeros(()))
print("init done")

def timed(name, fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.0f} ms")

bf = jnp.bfloat16
x = batch.astype(bf)

# (a) fwd only: encode+decode
fwd = jax.jit(lambda p, x: model.apply(
    {"params": p}, x, method=model.encode, train=True,
    rngs={"sample": rng}))
enc_dec = jax.jit(lambda p, x: model.apply(
    {"params": p}, model.apply({"params": p}, x, method=model.encode, train=True,
                               rngs={"sample": rng}),
    method=model.decode, train=True))
timed("(a) encode fwd", fwd, state.gen_params, x)
timed("(a2) encode+decode fwd", enc_dec, state.gen_params, x)

# (b) fwd + recon losses via value (no grad): reuse trainer loss
# full gen step (fwd+bwd+opt) for comparison
def gen_step(state, batch, rng):
    return trainer.train_step(state, batch, rng, step=0)
s, info = gen_step(state, batch, rng)
t0 = time.time()
for i in range(5):
    s, info = gen_step(state, batch, rng)
jax.block_until_ready(info)
print(f"(c) full gen step: {(time.time()-t0)/5*1000:.0f} ms")
s, info = trainer.train_step(state, batch, rng, step=1)
t0 = time.time()
for i in range(5):
    s, info = trainer.train_step(state, batch, rng, step=1)
jax.block_until_ready(info)
print(f"(d) full disc step: {(time.time()-t0)/5*1000:.0f} ms")

# chained-state measurement (exactly like the earlier bench)
state2 = trainer.init_state(jax.random.PRNGKey(1), batch)
s2, info = trainer.train_step(state2, batch, rng, step=0)
s2, info = trainer.train_step(s2, batch, rng, step=1)
jax.block_until_ready(info)
t0 = time.time()
s_c = s2
for i in range(2, 12):
    s_c, info = trainer.train_step(s_c, batch, rng, step=i)
jax.block_until_ready(info)
print(f"(e) chained alternating 10 steps: {(time.time()-t0)/10*1000:.0f} ms/step")
print("warmup_steps:", trainer.warmup_steps, "mode:", trainer.warmup_mode)
