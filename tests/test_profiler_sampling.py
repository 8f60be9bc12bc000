"""Whole-run sampling profiler (utils/profiler.py SamplingProfiler) — the
reference wraps every entry point in pyinstrument and dumps a per-run report
(omni/utils/profiler.py:40-102); this is the first-party equivalent."""

import os
import time


def _busy(deadline):
    x = 0
    while time.time() < deadline:
        for i in range(1000):
            x += i * i
    return x


def test_sampling_profiler_report(tmp_path):
    from dreamllm_tpu.utils.profiler import SamplingProfiler

    prof = SamplingProfiler(interval=0.002).start()
    _busy(time.time() + 0.4)
    out = str(tmp_path / "profile.txt")
    prof.stop(out)
    assert os.path.exists(out)
    text = open(out).read()
    assert "samples" in text and "## self time" in text
    # the busy loop must dominate the samples
    assert "_busy" in text
    assert prof._n > 20


def test_auto_profiler_writes_on_exception(tmp_path):
    import pytest

    from dreamllm_tpu.utils.profiler import auto_profiler

    out = str(tmp_path / "p.txt")
    with pytest.raises(RuntimeError):
        with auto_profiler(out, interval=0.002):
            _busy(time.time() + 0.1)
            raise RuntimeError("boom")
    assert os.path.exists(out)


def test_auto_profiler_disabled_writes_nothing(tmp_path):
    from dreamllm_tpu.utils.profiler import auto_profiler

    out = str(tmp_path / "p.txt")
    with auto_profiler(out, enabled=False):
        pass
    assert not os.path.exists(out)
