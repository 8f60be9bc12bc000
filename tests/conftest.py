"""Test bootstrap: force an 8-device virtual CPU mesh.

Multi-host/multi-chip logic is exercised on CPU via
``--xla_force_host_platform_device_count=8`` (the reference framework could
not test distributed paths without real GPUs; we can — SURVEY.md §4).

Note: the environment's ``sitecustomize`` imports jax at interpreter startup
(registering the axon TPU plugin with ``JAX_PLATFORMS=axon``), so env-var
overrides here are too late — we must go through ``jax.config`` instead, which
takes effect as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls in tests must be real fp32 (defaults can be bf16-ish on TPU).
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: repeat suite runs skip most XLA compiles
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
