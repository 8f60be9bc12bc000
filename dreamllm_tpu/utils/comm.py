"""Host/distributed communication helpers.

TPU-native equivalent of the reference's `omni/utils/comm.py` (NCCL tensor
collectives + a cached gloo group for picklable objects, :10-152). On TPU the
in-graph collectives are emitted by XLA from shardings — what remains is
host-level coordination, covered by jax.distributed + multihost_utils:

  reference                      → here
  get_rank/get_world_size        → process_index/process_count
  synchronize()                  → sync_global_devices barrier
  all_gather(object)             → process_allgather
  reduce_dict (loss averaging)   → reduce_dict via process_allgather mean
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def init_distributed(**kw):
    """jax.distributed.initialize, idempotent, no-op single-host.

    A failure is swallowed ONLY when nothing requested a multi-host world
    (no kwargs and no coordinator env) — then "cannot auto-detect" just means
    single-process. If the caller or environment explicitly configured a
    world (coordinator_address/num_processes or the standard env vars) a
    failed initialize must raise: silently proceeding would leave every host
    at process_count()==1, duplicating work and clobbering shared run dirs.
    """
    import os

    explicit = bool(kw) or any(
        os.environ.get(v)
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MASTER_ADDR", "JAX_NUM_PROCESSES")
    )
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # idempotent re-init
        if explicit:
            raise
    except ValueError:
        if explicit:
            raise


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize(name: str = "barrier"):
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_gather_objects(obj: Any) -> list[Any]:
    """Gather an arbitrary picklable object from every host (replaces the
    reference's gloo-group all_gather, comm.py:71-120)."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to a common length
    n = np.asarray([payload.size], np.int32)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros((maxlen,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]


def reduce_dict(d: dict[str, float], average: bool = True) -> dict[str, float]:
    """Mean/sum scalar dicts across hosts (comm.py:123-152)."""
    if jax.process_count() == 1:
        return dict(d)
    from jax.experimental import multihost_utils

    keys = sorted(d)
    vals = np.asarray([float(d[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(vals)
    red = gathered.mean(axis=0) if average else gathered.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, red)}
