"""tp>1 × ring/pipeline coverage — the exact mesh shape that deadlocked the
round-1/2 multi-chip dryruns (MULTICHIP_r0{1,2}.json: rc=134, an XLA:CPU
collective-rendezvous abort on a (data=2, fsdp=2, tp=2) mesh).

Root cause (docs/DISTRIBUTED.md "CPU rendezvous hazard"): the XLA:CPU thunk
runtime executes independent thunks with dynamic per-device-thread
scheduling, so one executable containing independent collectives over
DIFFERENT device subsets (2-device tp all-reduces + the 8-participant
ppermute chain) can have device threads enter different rendezvous first and
block each other — a runtime-substrate artifact, not a program hazard. On
real TPU every core runs the same SPMD executable in compiled program order,
so the cross-collective interleave cannot occur.

Because the failure mode is an uncatchable LOG(FATAL) process abort, these
tests run the step in a CHILD process with a watchdog: a deadlock fails the
test instead of killing the suite.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # full-suite only; fast tier: -m 'not slow'

_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # CPU-substrate mitigation for the rendezvous deadlock this test exists
    # to cover — see docs/DISTRIBUTED.md; without it the SP config aborts
    # intermittently (measured 2/2 standalone failures on the 1-core host)
    + " --xla_cpu_enable_concurrency_optimized_scheduler=false").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import numpy as np
import jax.numpy as jnp

from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import (
    DreamLLMConfig, init_dreamllm_params, param_freeze_mask,
)
from dreamllm_tpu.models.llama import LlamaConfig
from dreamllm_tpu.models.projector import ProjectorConfig
from dreamllm_tpu.parallel import (
    MeshConfig, batch_shardings, create_mesh, param_shardings,
)
from dreamllm_tpu.train import (
    OptimizerConfig, init_train_state, make_optimizer, make_train_step,
)

mode = sys.argv[1]
mesh = create_mesh(MeshConfig(data=2, fsdp=2, tp=2))
cfg = DreamLLMConfig(
    llm=LlamaConfig(
        vocab_size=40000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    ),
    vision=CLIPVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, image_size=8, patch_size=4,
    ),
    vision_projector=ProjectorConfig(
        projector_type="linear", in_dim=16, out_dim=64),
    n_dream_queries=4, image_embed_len=4,
    **({"sequence_parallel_axis": "fsdp"} if mode == "sp"
       else {"pipeline_parallel_axis": "fsdp", "pipeline_microbatches": 2}),
)
params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(jax.device_put, params, param_shardings(params, mesh))
rng = np.random.default_rng(5)
ids = rng.integers(10, 1000, size=(8, 32))
batch = {"input_ids": jnp.asarray(ids, jnp.int32),
         "labels": jnp.asarray(ids, jnp.int32)}
batch = jax.tree.map(jax.device_put, batch, batch_shardings(batch, mesh))
ocfg = OptimizerConfig(learning_rate=1e-4, warmup_steps=2, total_steps=10)
mask = param_freeze_mask(params, cfg)
tx = make_optimizer(ocfg, trainable_mask=mask)
step = make_train_step(cfg, tx, head_in_params=False, grad_accum=1,
                       remat=True, use_flash=False, trainable_mask=mask,
                       donate=False, mesh=mesh)
_, aux = step(init_train_state(params, tx), batch, jax.random.PRNGKey(1))
loss = float(aux["loss"])
assert np.isfinite(loss), loss

# reference loss on the SAME params without any parallel axis (plain path)
cfg_ref = dataclasses.replace(
    cfg, sequence_parallel_axis=None, pipeline_parallel_axis=None)
step_ref = make_train_step(cfg_ref, tx, head_in_params=False, grad_accum=1,
                           remat=True, use_flash=False, trainable_mask=mask,
                           donate=False)
_, aux_ref = step_ref(init_train_state(params, tx), batch, jax.random.PRNGKey(1))
assert abs(loss - float(aux_ref["loss"])) < 5e-3 * max(1.0, abs(loss)), (
    loss, float(aux_ref["loss"]))
print(f"TP2-{mode}-OK loss={loss:.5f}", flush=True)
"""


@pytest.mark.parametrize("mode", ["sp", "pp"])
def test_train_step_tp2_with_parallel_axis(mode):
    """Full make_train_step on the dryrun's (data=2, fsdp=2, tp=2) mesh with
    ring attention / pipeline staging — in a watchdogged child process."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, mode],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, (
        f"tp=2 {mode} train step died (rc={r.returncode}) — the "
        f"MULTICHIP deadlock class\nstdout: {r.stdout[-2000:]}\n"
        f"stderr: {r.stderr[-2000:]}"
    )
    assert f"TP2-{mode}-OK" in r.stdout
