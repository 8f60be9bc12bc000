"""CLI entry-point plumbing: --config_file + overrides → hydrated dataclass.

TPU-native equivalent of the reference's ``LazyArgumentParser`` / ``default_setup``
(omni/config/arg_parser.py:31-209): load the Python config, apply hydra-style
overrides, set up the run dir / logging / seed, snapshot the resolved config,
then hydrate a typed dataclass (dacite replaced by a small strict hydrator).
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import logging
import os
import types
import typing
from typing import Any, Type, TypeVar

from dreamllm_tpu.config.lazy import LazyConfig

T = TypeVar("T")
logger = logging.getLogger("dreamllm_tpu")


def from_dict(cls: Type[T], data: dict) -> T:
    """Strict dict → dataclass hydration (dacite replacement): unknown keys
    raise; nested dataclasses recurse; extra containers pass through."""
    if not dataclasses.is_dataclass(cls):
        return data  # type: ignore[return-value]
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise ValueError(f"{cls.__name__}: unknown config keys {sorted(unknown)}")
    kwargs = {}
    hints = typing.get_type_hints(cls)
    for name, value in data.items():
        t = hints.get(name, fields[name].type)
        origin = typing.get_origin(t)
        if dataclasses.is_dataclass(t) and isinstance(value, dict):
            value = from_dict(t, value)
        elif origin is typing.Union or isinstance(t, types.UnionType):
            # typing.Optional[X] AND PEP 604 "X | None" (the style this repo
            # uses under `from __future__ import annotations`)
            args = [a for a in typing.get_args(t) if a is not type(None)]
            if len(args) == 1 and dataclasses.is_dataclass(args[0]) and isinstance(value, dict):
                value = from_dict(args[0], value)
        kwargs[name] = value
    return cls(**kwargs)


@dataclasses.dataclass
class LazyArguments:
    """Common flags every entry point takes (reference arg_parser.py:31-44)."""

    config_file: str = ""
    run_dir: str = "./runs"
    seed: int = 42
    use_profiler: bool = False
    logger_rank: str = "main"  # "main" | "all"


def default_setup(args: Any, config: Any) -> str:
    """run_dir timestamping, logging, seed, config snapshot
    (reference arg_parser.py:110-157). Returns the run dir."""
    plat = os.environ.get("DREAMLLM_PLATFORM")
    if plat:
        # Subprocess-reachable platform override for the CLI entry points
        # (tests/e2e chain the real `python -m projects...` commands on the
        # CPU mesh). Env JAX_PLATFORMS alone cannot do this here: this
        # machine's sitecustomize imports jax at interpreter start with
        # JAX_PLATFORMS=axon; the config update below works because no
        # backend has been initialized yet at entry-point setup time.
        import jax

        jax.config.update("jax_platforms", plat)
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    try:
        import jax

        if jax.process_count() > 1:
            # every host must land in the SAME run dir (shard merging,
            # checkpoints): broadcast process 0's wall-clock stamp
            from jax.experimental import multihost_utils
            import numpy as _np

            raw = _np.frombuffer(stamp.encode(), dtype=_np.uint8)
            raw = multihost_utils.broadcast_one_to_all(raw)
            stamp = bytes(_np.asarray(raw)).decode()
    except Exception:
        pass  # single-process or jax not initialized yet
    run_dir = os.path.join(args.run_dir, stamp)
    os.makedirs(run_dir, exist_ok=True)

    from dreamllm_tpu.utils.logging import setup_logger

    setup_logger(run_dir=run_dir, rank_policy=getattr(args, "logger_rank", "main"))

    seed = getattr(args, "seed", 42)
    try:
        import jax

        seed = seed + jax.process_index()  # per-host decorrelation (:149-150)
    except Exception:
        pass
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed % 2**32)

    try:
        LazyConfig.save(config, os.path.join(run_dir, "config_snapshot.py"))
    except Exception as e:
        logger.warning("config snapshot failed: %s", e)

    # log the resolved config with CLI-overridden keys called out — the
    # reference prints the full YAML with changed keys colorized
    # (arg_parser.py:143-146 compare_dicts + add_color); here the override
    # list is exact (recorded at parse time) instead of re-diffed
    overrides = getattr(args, "cli_overrides", None)
    try:
        import json

        logger.info("command line arguments: %s", args)
        if overrides:
            logger.info("CLI-overridden keys: %s", ", ".join(overrides))
        logger.info("full config:\n%s", json.dumps(config, indent=2, default=repr))
    except Exception as e:  # config logging must never kill a run
        logger.warning("config logging failed: %s", e)

    if getattr(args, "use_profiler", False):
        # whole-run sampling profile artifact (the reference wraps every
        # entry point in pyinstrument and dumps per-run HTML — LazyLaunch,
        # arg_parser.py:196-209 + profiler.py:40-102). Registered via atexit
        # so the report lands even on exceptions / time_out SystemExit.
        import atexit

        from dreamllm_tpu.utils.profiler import SamplingProfiler

        prof = SamplingProfiler().start()
        out = os.path.join(run_dir, "profile.txt")
        atexit.register(lambda: prof.stop(out))
        logger.info("sampling profiler on; report will land at %s", out)
    return run_dir


class LazyArgumentParser:
    """``prog --config_file cfg.py key=value ...`` → (args, config).

    Keys present in the arguments dataclass are hydrated into it; everything
    else is applied to the loaded config as an override
    (reference arg_parser.py:164-193).
    """

    def __init__(self, args_cls: Type[T] = LazyArguments):
        self.args_cls = args_cls

    def parse(self, argv: list[str] | None = None) -> tuple[Any, Any]:
        p = argparse.ArgumentParser()
        p.add_argument("--config_file", required=True)
        p.add_argument("overrides", nargs="*")
        ns = p.parse_args(argv)

        config = LazyConfig.load(ns.config_file)
        field_names = {f.name for f in dataclasses.fields(self.args_cls)}
        cfg_overrides, arg_overrides = [], {}
        for ov in ns.overrides:
            key = ov.split("=", 1)[0].lstrip("+")
            root = key.split(".", 1)[0]
            if root in field_names and "." not in key:
                from dreamllm_tpu.config.lazy import _parse_value

                arg_overrides[key] = _parse_value(ov.split("=", 1)[1])
            else:
                cfg_overrides.append(ov)
        LazyConfig.apply_overrides(config, cfg_overrides)

        data = dict(config) if isinstance(config, dict) else {}
        args_data = {
            k: v for k, v in data.items()
            if k in field_names and not isinstance(v, dict)
        }
        args_data.update(arg_overrides)
        args_data.setdefault("config_file", ns.config_file)
        args = from_dict(self.args_cls, args_data)
        # exact override provenance for default_setup's config logging
        try:
            args.cli_overrides = [ov.split("=", 1)[0].lstrip("+") for ov in ns.overrides]
        except Exception:
            pass  # frozen args dataclasses just skip the extra attribute
        return args, config
