"""Real multi-process execution: 2 CPU processes under jax.distributed.

The reference's default operating mode is 1-process-per-GPU over NCCL
(omni/utils/comm.py:52-69, scripts/tool/smartrun:43-113); everything else in
this suite runs distributed paths single-process on a virtual mesh. This
test closes that gap: two OS processes form a jax.distributed world through
the torchrun-compatible env resolution (utils/launch.py resolve_launch_env →
utils/comm.py init_distributed), then exercise the multi-process branches of
process_allgather/reduce_dict/synchronize and run ONE data-sharded train
step over the global 2-process mesh, checking both ranks agree on the loss.
"""

import pytest

pytestmark = pytest.mark.slow  # full-suite only; fast tier: -m 'not slow'

import os
import socket
import subprocess
import sys

_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")

from dreamllm_tpu.utils.launch import resolve_launch_env
from dreamllm_tpu.utils.comm import (
    all_gather_objects, get_rank, get_world_size, init_distributed,
    reduce_dict, synchronize,
)

# torchrun-style env (MASTER_ADDR/WORLD_SIZE/RANK) -> initialize kwargs
kw = resolve_launch_env()
assert kw.get("num_processes") == 2, kw
init_distributed(**kw)
assert get_world_size() == 2, get_world_size()
rank = get_rank()
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 procs

# host-object collectives (multi-process branches)
objs = all_gather_objects({"rank": rank, "payload": "x" * (10 + 20 * rank)})
assert [o["rank"] for o in objs] == [0, 1], objs
red = reduce_dict({"loss": float(rank)}, average=True)
assert abs(red["loss"] - 0.5) < 1e-6, red
synchronize("pre-step")

# one data-sharded train step over the global mesh
import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward, llama_logits

cfg = LlamaConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, dtype=jnp.float32,
)
mesh = Mesh(np.asarray(jax.devices()), ("data",))
repl = NamedSharding(mesh, P())
params = jax.jit(
    lambda r: init_llama_params(r, cfg), out_shardings=repl
)(jax.random.PRNGKey(0))
tx = optax.adamw(1e-3)
opt_state = jax.jit(tx.init, out_shardings=repl)(params)

rng = np.random.default_rng(7)
ids_global = rng.integers(2, 120, size=(8, 16)).astype(np.int32)  # same on both ranks
bs = NamedSharding(mesh, P("data"))
ids = jax.make_array_from_process_local_data(bs, ids_global[rank * 4:(rank + 1) * 4])

def loss_fn(p, ids):
    h = llama_forward(p, cfg, input_ids=ids, use_flash=False)["last_hidden_state"]
    lp = jax.nn.log_softmax(llama_logits(p, cfg, h), axis=-1)
    return -jnp.mean(jnp.take_along_axis(lp, ids[..., None], axis=-1))

@jax.jit
def step(p, o, ids):
    loss, g = jax.value_and_grad(loss_fn)(p, ids)
    up, o = tx.update(g, o, p)
    return optax.apply_updates(p, up), o, loss

params, opt_state, loss = step(params, opt_state, ids)
loss = float(loss)  # replicated scalar — fetchable on every rank
losses = all_gather_objects(loss)
assert abs(losses[0] - losses[1]) < 1e-6, losses
assert np.isfinite(loss)
synchronize("post-step")
print(f"MP-OK rank={rank} loss={loss:.6f}", flush=True)
"""


def test_two_process_jax_distributed():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.update({
            "MASTER_ADDR": "127.0.0.1",
            "MASTER_PORT": str(port),
            "WORLD_SIZE": "2",
            "RANK": str(rank),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, (
            f"rank {rank} failed (rc={rc})\nstdout: {out[-2000:]}\n"
            f"stderr: {err[-2000:]}"
        )
        assert f"MP-OK rank={rank}" in out
    # both ranks must report the identical replicated loss
    l0 = outs[0][1].split("loss=")[1].strip()
    l1 = outs[1][1].split("loss=")[1].strip()
    assert l0 == l1, (l0, l1)
