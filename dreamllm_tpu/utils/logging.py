"""Rank-aware logging (reference omni/utils/loguru.py:13-157, stdlib-based).

Process-0 logs to stderr; per-rank file sinks under the run dir when
``rank_policy="all"`` (the reference's ``logger_rank`` flag). ``warning_once``
dedupes repeated warnings (loguru.py:13-25).
"""

from __future__ import annotations

import logging
import os
import sys

_ROOT = "dreamllm_tpu"
_seen_warnings: set[str] = set()


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def get_logger(name: str = _ROOT) -> logging.Logger:
    """Loggers outside the package namespace (the ``projects.*`` entry
    points) are re-rooted under it so they inherit the handlers
    ``setup_logger`` installs — otherwise their records (stage-mix info,
    eval scores) silently go nowhere."""
    if name != _ROOT and not name.startswith(_ROOT + "."):
        name = f"{_ROOT}.{name}"
    return logging.getLogger(name)


def warning_once(msg: str, *args, logger_name: str = _ROOT):
    key = msg % args if args else msg
    if key not in _seen_warnings:
        _seen_warnings.add(key)
        logging.getLogger(logger_name).warning(msg, *args)


def setup_logger(
    run_dir: str | None = None,
    rank_policy: str = "main",
    level: int = logging.INFO,
) -> logging.Logger:
    rank = _process_index()
    logger = logging.getLogger(_ROOT)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(
        f"%(asctime)s [rank{rank}] %(levelname)s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
    )
    if rank == 0:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(fmt)
        logger.addHandler(h)
    if run_dir and (rank == 0 or rank_policy == "all"):
        os.makedirs(run_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(run_dir, f"log_rank{rank}.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger
