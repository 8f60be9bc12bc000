"""Profiling / tracing utilities.

TPU-native equivalent of the reference's profiler stack
(omni/utils/profiler.py:26-102): pyinstrument/torch.profiler become
``jax.profiler`` xprof traces; ``FunctionProfiler`` coarse timers and the
``time_out`` SIGALRM profile-and-exit knob port directly.
"""

from __future__ import annotations

import contextlib
import signal
import time

from dreamllm_tpu.utils.logging import get_logger

logger = get_logger("dreamllm_tpu.profiler")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """xprof trace of the enclosed region (view with tensorboard/xprof).
    Replaces the torch.profiler TensorBoard handler (profiler.py:50-68)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("trace written to %s", log_dir)


class FunctionProfiler:
    """Coarse wall-clock timer context (reference profiler.py:26-37)."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        logger.info("[%s] took %.3fs", self.name, self.elapsed)
        return False


def enable_full_determinism(seed: int = 0):
    """Deterministic runs (reference trainer_utils.py:56-80
    enable_full_determinism): on TPU/XLA this means seeding python/numpy and
    asking XLA for deterministic op lowering. Call BEFORE the first jit."""
    import os
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed % 2**32)
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_gpu_deterministic_ops" not in flags:  # harmless on TPU
        os.environ["XLA_FLAGS"] = (flags + " --xla_gpu_deterministic_ops=true").strip()
    try:
        import jax

        jax.config.update("jax_threefry_partitionable", True)
    except Exception:
        pass


def install_timeout(seconds: int):
    """SIGALRM abort after N seconds — profile a few steps cheaply
    (reference profiler.py:70-84 / arg_parser.py time_out)."""
    if seconds <= 0:
        return

    def handler(signum, frame):
        raise SystemExit(f"time_out: aborting after {seconds}s (profiling run)")

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def annotate(name: str):
    """Named region visible in xprof (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class MemoryTracker:
    """Per-stage peak device-memory deltas (reference TrainerMemoryTracker,
    trainer_utils.py:399-635). TPU side uses device memory stats."""

    def __init__(self):
        self.stages: dict[str, dict] = {}

    @staticmethod
    def _device_bytes() -> int:
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats()
            return int(stats.get("bytes_in_use", 0)) if stats else 0
        except Exception:
            return 0

    @contextlib.contextmanager
    def stage(self, name: str):
        before = self._device_bytes()
        t0 = time.perf_counter()
        yield
        self.stages[name] = {
            "device_bytes_delta": self._device_bytes() - before,
            "seconds": time.perf_counter() - t0,
        }

    def metrics(self) -> dict:
        return dict(self.stages)
