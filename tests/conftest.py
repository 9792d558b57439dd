"""Test configuration: force CPU with 8 virtual devices so DP/TP mesh tests
run without TPU hardware (SURVEY.md §4 item 4).

NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
jax.config.update('jax_platforms', ...) is required to actually select CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
