"""Multi-host launch — TPU-native equivalent of the reference's launchers
(scripts/tool/smartrun: a torchrun variant that derives world size / node
rank / coordinator from rlaunch replica env vars and spawns one process per
GPU; plus the torchrun recipes in scripts/train/*.sh).

On TPU pods the shape is different: ONE python process per host (each host
already owns its local chips), coordination via ``jax.distributed``. On
Cloud TPU / GKE, JAX auto-discovers everything from the TPU metadata — the
launcher's job reduces to (a) resolving explicit/generic env overrides for
non-TPU or manual clusters and (b) initializing before any backend touch.

Usage (every host runs the same command):

    python -m dreamllm_tpu.utils.launch projects.dreamllm.train -- \
        --config_file projects/dreamllm/configs/stage1.py

Env resolution order (first hit wins):
  1. explicit flags (--coordinator, --num-processes, --process-id)
  2. DREAMLLM_COORDINATOR / DREAMLLM_NUM_PROCESSES / DREAMLLM_PROCESS_ID
  3. torchrun-compatible MASTER_ADDR:MASTER_PORT / WORLD_SIZE / RANK
     (so rlaunch/slurm wrappers written for the reference keep working)
  4. nothing — jax.distributed auto-detect (Cloud TPU metadata), or
     single-process when not on a pod.
"""

from __future__ import annotations

import os
import runpy
import sys


def resolve_launch_env(env: dict | None = None) -> dict:
    """Resolve jax.distributed.initialize kwargs from the environment.
    Returns {} when nothing is specified (auto-detect / single host)."""
    env = os.environ if env is None else env
    kw: dict = {}
    if env.get("DREAMLLM_COORDINATOR"):
        kw["coordinator_address"] = env["DREAMLLM_COORDINATOR"]
        kw["num_processes"] = int(env.get("DREAMLLM_NUM_PROCESSES", 1))
        kw["process_id"] = int(env.get("DREAMLLM_PROCESS_ID", 0))
    elif env.get("MASTER_ADDR") and env.get("WORLD_SIZE"):
        # torchrun/rlaunch convention (reference smartrun exports these)
        port = env.get("MASTER_PORT", "29500")
        kw["coordinator_address"] = f"{env['MASTER_ADDR']}:{port}"
        kw["num_processes"] = int(env["WORLD_SIZE"])
        kw["process_id"] = int(env.get("RANK", env.get("NODE_RANK", 0)))
    return kw


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    kw: dict = {}
    while argv and argv[0].startswith("--"):
        flag = argv.pop(0)
        if flag == "--":
            break
        name, _, val = flag.partition("=")
        if not val:
            val = argv.pop(0)
        key = {
            "--coordinator": "coordinator_address",
            "--num-processes": "num_processes",
            "--process-id": "process_id",
        }[name]
        kw[key] = val if key == "coordinator_address" else int(val)
    if not argv:
        raise SystemExit("usage: python -m dreamllm_tpu.utils.launch [flags] <module> [-- args]")
    module = argv.pop(0)
    if argv and argv[0] == "--":
        argv.pop(0)

    from dreamllm_tpu.utils.comm import init_distributed

    init_distributed(**{**resolve_launch_env(), **kw})

    sys.argv = [module] + argv
    runpy.run_module(module, run_name="__main__")


if __name__ == "__main__":
    main()
