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
# Persistent compile cache: OFF by default for tests. Reading a cached CPU
# executable back through backend.deserialize_executable segfaulted the
# full-suite process intermittently (observed twice on 2026-08-17, stack in
# compilation_cache.get_executable_and_time; the same tests pass alone) —
# a hard crash loses the whole run, which costs far more than the compiles
# the cache saves. Opt back in with DREAMLLM_TEST_CACHE=1 for local
# iteration on a single test file; bench.py manages its own (TPU) cache.
if os.environ.get("DREAMLLM_TEST_CACHE") == "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_native_compiler_state():
    """Drop JAX's compiled-executable caches after every test module.

    A single pytest process accumulates hundreds of live XLA CPU
    executables across the suite; past ~a-full-suite's worth the native
    compiler/deserializer intermittently SEGFAULTS on the next compile
    (observed 3× on 2026-08-17, different tests, all late-suite, all
    passing in isolation — stacks end in backend_compile_and_load /
    deserialize_executable). Clearing per module bounds the native state;
    cross-module program reuse is small, so the recompile cost is minor.
    """
    yield
    jax.clear_caches()
