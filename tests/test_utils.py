"""Utility-module tests: image io, comm single-host paths, profiler,
metrics logger jsonl, video already covered elsewhere."""

import json
import os
import time

import numpy as np

from dreamllm_tpu.utils.comm import (
    all_gather_objects,
    get_rank,
    get_world_size,
    is_main_process,
    reduce_dict,
    synchronize,
)
from dreamllm_tpu.utils.image import (
    base64_to_image,
    image_to_base64,
    load_image,
    make_grid,
    save_image,
)
from dreamllm_tpu.utils.logging import setup_logger, warning_once
from dreamllm_tpu.utils.metrics_logger import MetricsLogger, rewrite_logs
from dreamllm_tpu.utils.profiler import FunctionProfiler, MemoryTracker


class TestImage:
    def test_save_load_roundtrip(self, tmp_path):
        arr = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "x.png")
        save_image(arr, p)
        back = load_image(p)
        np.testing.assert_array_equal(arr, back)

    def test_float_input_scaled(self, tmp_path):
        arr = np.full((4, 4, 3), 0.5, np.float32)
        p = str(tmp_path / "f.png")
        save_image(arr, p)
        back = load_image(p)
        assert abs(int(back[0, 0, 0]) - 127) <= 1

    def test_base64_roundtrip(self):
        arr = (np.random.default_rng(1).random((6, 6, 3)) * 255).astype(np.uint8)
        s = image_to_base64(arr)
        back = base64_to_image(s)
        np.testing.assert_array_equal(arr, back)

    def test_make_grid(self):
        imgs = [np.full((4, 4, 3), i, np.uint8) for i in range(4)]
        grid = make_grid(imgs, cols=2, pad=1)
        assert grid.shape == (9, 9, 3)
        assert grid[0, 0, 0] == 0 and grid[5, 5, 0] == 3


class TestComm:
    def test_single_host_paths(self):
        assert get_rank() == 0 and get_world_size() == 1
        assert is_main_process()
        synchronize()
        assert all_gather_objects({"a": 1}) == [{"a": 1}]
        out = reduce_dict({"x": 2.0, "y": 3.0})
        assert out == {"x": 2.0, "y": 3.0}


class TestProfiler:
    def test_function_profiler_times(self):
        with FunctionProfiler("t") as fp:
            time.sleep(0.05)
        assert fp.elapsed >= 0.05

    def test_memory_tracker_stages(self):
        mt = MemoryTracker()
        with mt.stage("s1"):
            _ = np.zeros(1000)
        m = mt.metrics()
        assert "s1" in m and m["s1"]["seconds"] >= 0


class TestMetricsLogger:
    def test_jsonl_fallback_and_rewrite(self, tmp_path):
        run = str(tmp_path / "run")
        ml = MetricsLogger(run, use_wandb=False)
        ml.log({"loss": 1.5, "eval_acc": 0.7}, step=3)
        ml.finish()
        lines = open(os.path.join(run, "metrics.jsonl")).read().strip().splitlines()
        rec = json.loads(lines[0])
        assert rec["step"] == 3
        assert rec["train/loss"] == 1.5
        assert rec["eval/acc"] == 0.7

    def test_rewrite_logs(self):
        out = rewrite_logs({"loss": 1, "eval_x": 2, "val_y": 3})
        assert set(out) == {"train/loss", "eval/x", "val/y"}

    def test_log_images_to_png(self, tmp_path):
        run = str(tmp_path / "run2")
        ml = MetricsLogger(run, use_wandb=False)
        ml.log_images({"sample": np.random.default_rng(0).random((4, 4, 3))}, step=7)
        files = os.listdir(os.path.join(run, "val_images"))
        assert any(f.startswith("000007_sample") for f in files)


class TestLogging:
    def test_warning_once_dedupes(self, tmp_path):
        import logging

        logger = setup_logger(run_dir=str(tmp_path))
        records = []

        class Capture(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        logger.addHandler(Capture())
        warning_once("unique-warning-abc")
        warning_once("unique-warning-abc")
        assert records.count("unique-warning-abc") == 1


class TestLaunch:
    """Multi-host launcher env resolution (utils/launch.py; reference
    scripts/tool/smartrun rank derivation)."""

    def test_explicit_env(self):
        from dreamllm_tpu.utils.launch import resolve_launch_env

        kw = resolve_launch_env({
            "DREAMLLM_COORDINATOR": "10.0.0.1:8476",
            "DREAMLLM_NUM_PROCESSES": "4",
            "DREAMLLM_PROCESS_ID": "2",
        })
        assert kw == {"coordinator_address": "10.0.0.1:8476",
                      "num_processes": 4, "process_id": 2}

    def test_torchrun_compat(self):
        from dreamllm_tpu.utils.launch import resolve_launch_env

        kw = resolve_launch_env({"MASTER_ADDR": "h0", "MASTER_PORT": "1234",
                                 "WORLD_SIZE": "8", "RANK": "5"})
        assert kw == {"coordinator_address": "h0:1234",
                      "num_processes": 8, "process_id": 5}

    def test_empty_is_autodetect(self):
        from dreamllm_tpu.utils.launch import resolve_launch_env

        assert resolve_launch_env({}) == {}
