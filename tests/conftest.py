"""Test configuration: run everything on a simulated 8-device CPU platform.

This replaces the reference's non-strategy of "just run on N GPUs"
(SURVEY §4): sharding/collective logic is validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count`` without any TPU hardware.
Must run before the first jax import anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The TPU-tunnel plugin (when present) force-updates jax_platforms at
# interpreter startup, overriding the env var; an explicit config update here
# wins and keeps tests on the fast local CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Never read/write the persistent compilation cache under tests: XLA:CPU AOT
# entries written by other processes (the axon TPU-tunnel bench) carry
# different machine/tuning features (+prefer-no-gather/scatter) — loading
# them risks SIGILL and flips near-tied decode results at the 1e-7 level
# (two order-dependent test failures traced to exactly this).
jax.config.update("jax_enable_compilation_cache", False)
