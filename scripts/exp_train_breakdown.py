"""Where does the 1B train step spend its time? (real chip)

Times, at the train_step_1b shapes (0.94B, b4 s2048, flash, 8-bit AdamW):
  1. forward loss only
  2. value_and_grad, remat variants: False | True (full) | "dots"
  3. grad + optimizer update (the full step) for the best remat
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_train_breakdown.py
"""
import sys
import time

import bench
bench._enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np
import optax
from dreamllm_tpu.train.optim8bit import adamw_8bit
from dreamllm_tpu.models.llama import (
    LlamaConfig, init_llama_params, llama_forward, llama_logits,
)

cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, intermediate_size=5504,
                  num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=16,
                  max_position_embeddings=2048, dtype=jnp.bfloat16)
params = jax.jit(lambda r: init_llama_params(r, cfg))(jax.random.PRNGKey(0))
n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
B, S = 4, 2048
fwd_flops = 2 * n_params * B * S + 4 * B * 16 * S * S * 128 * 0.5


def timed(fn, params, label="", reps=5):
    # identical (program, args) reruns are served cached through the axon
    # tunnel — vary the token ids every invocation
    def make_ids(seed):
        return jax.random.randint(jax.random.PRNGKey(seed), (B, S), 10, 31000)

    def sync(out):
        # block_until_ready does not block through the axon tunnel — the only
        # reliable sync is fetching a scalar (CLAUDE.md); every fn here
        # returns the scalar loss as its first leaf
        np.asarray(jax.tree.leaves(out)[0])

    t0 = time.perf_counter()
    sync(fn(params, make_ids(0), make_ids(0)))
    print(f"  [{label}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(reps):
        ids = make_ids(i + 1)
        np.asarray(jnp.sum(ids))
        t0 = time.perf_counter()
        sync(fn(params, ids, ids))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def loss_fn(p, ids, labels, remat):
    h = llama_forward(p, cfg, input_ids=ids, use_flash=True, remat=remat)["last_hidden_state"]
    logits = llama_logits(p, cfg, h)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


from functools import partial

fwd = jax.jit(partial(loss_fn, remat=False))
dt = timed(fwd, params, label="fwd")
print(f"fwd-only: {dt*1e3:.0f} ms  ({fwd_flops/dt/1e12:.1f} TF/s, {fwd_flops/dt/197e12*100:.0f}% MFU)",
      flush=True)

# no-logits forward: isolates the lm_head+log_softmax cost
fwd_nolm = jax.jit(lambda p, i, l: jnp.sum(llama_forward(
    p, cfg, input_ids=i, use_flash=True)["last_hidden_state"].astype(jnp.float32)))
dt_nl = timed(fwd_nolm, params, label="fwd-no-lmhead")
print(f"fwd no-lmhead: {dt_nl*1e3:.0f} ms", flush=True)

for remat in (True, "dots"):  # remat=False grad crashes the remote compiler
    try:
        g = jax.jit(lambda p, i, l, r=remat: jax.value_and_grad(
            partial(loss_fn, remat=r))(p, i, l))
        dt = timed(g, params, label=f"grad remat={remat}")
        mult = 3 if remat is False else 4  # nominal fwd-equivalents
        print(f"value_and_grad remat={remat!s:5}: {dt*1e3:.0f} ms "
              f"({mult}x-fwd MFU {mult*fwd_flops/dt/197e12*100:.0f}%)", flush=True)
    except Exception as e:
        print(f"value_and_grad remat={remat}: FAILED {str(e)[:150]}", flush=True)
