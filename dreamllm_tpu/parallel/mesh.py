"""Device mesh construction — the single parallelism substrate.

One ``(data, fsdp, tp)`` mesh replaces the reference's entire distributed
zoo: DDP (torchrun, SURVEY §2.8), HF/accelerate FSDP with ignored-modules
hacks (trainer.py:199-283), DeepSpeed ZeRO (trainer.py:537-538), and the
latent ``pretraining_tp`` sliced matmuls (modeling_dreamllm.py:320-333).
XLA emits the collectives; there is no NCCL/gloo user code to port
(comm.py becomes jax.distributed + these axes).

Axis semantics:
  data — pure data parallelism (gradients all-reduced over ICI/DCN)
  fsdp — parameter/optimizer sharding (ZeRO-3 style; XLA inserts
         all-gather on use + reduce-scatter on grads)
  tp   — tensor parallelism over attention heads / MLP hidden
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


AXES = ("data", "fsdp", "tp")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = -1  # -1: absorb remaining devices
    tp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        d, f, t = self.data, self.fsdp, self.tp
        n_free = sum(x == -1 for x in (d, f, t))
        if n_free > 1:
            raise ValueError(
                f"MeshConfig(data={d}, fsdp={f}, tp={t}): at most one axis "
                "may be -1 (the remainder absorber)"
            )
        known = [x for x in (d, f, t) if x != -1]
        prod = int(np.prod(known)) if known else 1
        if n_devices % prod != 0 or prod > n_devices:
            raise ValueError(
                f"MeshConfig(data={d}, fsdp={f}, tp={t}): fixed axes need a "
                f"multiple of {prod} devices, got {n_devices}"
            )
        missing = n_devices // prod
        out = tuple(missing if x == -1 else x for x in (d, f, t))
        if int(np.prod(out)) != n_devices:
            raise ValueError(f"mesh {out} does not cover {n_devices} devices")
        return out


def create_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build the (data, fsdp, tp) mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    cfg = cfg or MeshConfig()
    shape = cfg.resolve(len(devices))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)
