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


class SamplingProfiler:
    """Whole-run wall-clock sampling profiler — the reference wraps EVERY
    entry point in pyinstrument and dumps an HTML per run
    (omni/utils/profiler.py:40-102, wired by LazyLaunch arg_parser.py:196-209).
    pyinstrument isn't in this environment, so this is a first-party
    equivalent: a daemon thread samples the main thread's stack at
    ``interval`` seconds and writes a collapsed-stack report (self-time and
    cumulative leaderboards + flamegraph-compatible lines) on stop.

    Cost: one ``sys._current_frames()`` walk per sample (~10 us at 100 Hz on
    this host) — cheap enough to leave on for whole training runs, which is
    exactly how the reference uses it (``use_profiler`` defaults ON there).
    """

    def __init__(self, interval: float = 0.01, max_samples: int = 2_000_000):
        import threading

        self.interval = interval
        self.max_samples = max_samples
        self._target = threading.main_thread().ident
        self._stacks: dict[tuple, int] = {}
        self._n = 0
        self._stop = threading.Event()
        self._thread: "threading.Thread | None" = None
        self.t0 = 0.0

    def _sample(self):
        import sys

        while not self._stop.wait(self.interval):
            frame = sys._current_frames().get(self._target)
            if frame is None or self._n >= self.max_samples:
                continue
            stack = []
            while frame is not None:
                code = frame.f_code
                stack.append(f"{code.co_name} ({code.co_filename}:{frame.f_lineno})")
                frame = frame.f_back
            key = tuple(reversed(stack))
            self._stacks[key] = self._stacks.get(key, 0) + 1
            self._n += 1

    def start(self) -> "SamplingProfiler":
        import threading

        self.t0 = time.time()
        self._thread = threading.Thread(target=self._sample, daemon=True,
                                        name="sampling-profiler")
        self._thread.start()
        return self

    def stop(self, out_path: str | None = None) -> str | None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        if out_path is None:
            return None
        total = max(self._n, 1)
        wall = time.time() - self.t0
        self_t: dict[str, int] = {}
        cum_t: dict[str, int] = {}
        for stack, n in self._stacks.items():
            self_t[stack[-1]] = self_t.get(stack[-1], 0) + n
            for f in set(stack):
                cum_t[f] = cum_t.get(f, 0) + n
        lines = [
            f"# sampling profile: {self._n} samples @ {self.interval*1e3:.0f} ms, "
            f"{wall:.1f}s wall",
            "", "## self time", "",
        ]
        for f, n in sorted(self_t.items(), key=lambda kv: -kv[1])[:40]:
            lines.append(f"{100*n/total:6.2f}%  {f}")
        lines += ["", "## cumulative", ""]
        for f, n in sorted(cum_t.items(), key=lambda kv: -kv[1])[:40]:
            lines.append(f"{100*n/total:6.2f}%  {f}")
        lines += ["", "## collapsed stacks (flamegraph.pl compatible)", ""]
        for stack, n in sorted(self._stacks.items(), key=lambda kv: -kv[1]):
            lines.append(";".join(s.split(" (")[0] for s in stack) + f" {n}")
        report = "\n".join(lines) + "\n"
        with open(out_path, "w") as fh:
            fh.write(report)
        logger.info("sampling profile (%d samples) written to %s", self._n, out_path)
        return out_path


@contextlib.contextmanager
def auto_profiler(out_path: str, interval: float = 0.01, enabled: bool = True):
    """Context wrapping a whole entry point (the reference's auto_profiler,
    profiler.py:40-102): sample for the duration, write the report on exit —
    including on exceptions and the time_out SystemExit."""
    if not enabled:
        yield None
        return
    prof = SamplingProfiler(interval=interval).start()
    try:
        yield prof
    finally:
        prof.stop(out_path)


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
