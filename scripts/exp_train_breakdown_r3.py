"""Train-step time breakdown on the real TPU (VERDICT r3 item #3).

All timed functions take params as jit ARGUMENTS — closure arrays become
HLO constants and hang/413 the remote compiler (see .claude/skills/verify).
Full-step variants run FIRST so partial output is decision-useful.
"""
import time

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreamllm_tpu.models.llama import (
    LlamaConfig, init_llama_params, llama_forward, llama_logits,
)
from dreamllm_tpu.train.optim8bit import adamw_8bit

hidden, inter, layers, heads = 2048, 5504, 16, 16
batch, seq = 4, 2048
cfg = LlamaConfig(
    vocab_size=32000, hidden_size=hidden, intermediate_size=inter,
    num_hidden_layers=layers, num_attention_heads=heads,
    num_key_value_heads=heads, max_position_embeddings=seq,
    dtype=jnp.bfloat16,
)
params = jax.jit(lambda r: init_llama_params(r, cfg))(jax.random.PRNGKey(0))
n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
print(f"n_params {n_params/1e9:.3f}B", flush=True)

tx8 = adamw_8bit(3e-4)
opt8 = jax.jit(tx8.init)(params)


def fetch(outs):
    leaf = jax.tree.leaves(outs)[-1]
    if leaf.size <= 1024:
        np.asarray(leaf)
    else:
        np.asarray(jnp.sum(leaf))


def timed(fn, argf, reps=5, label=""):
    try:
        t0 = time.perf_counter()
        fetch(fn(*argf(0)))
        print(f"  [{label}: warm-up {time.perf_counter()-t0:.0f}s]", flush=True)
    except Exception as e:
        print(f"{label:44s} FAILED: {str(e)[:140]}", flush=True)
        return None
    ts = []
    for i in range(reps):
        a = argf(i + 1)
        t0 = time.perf_counter()
        fetch(fn(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    print(f"{label:44s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def make_ids(seed):
    return jax.random.randint(jax.random.PRNGKey(seed), (batch, seq), 10, 31000)


def loss_fn(p, ids, remat, flash):
    h = llama_forward(p, cfg, input_ids=ids, use_flash=flash, remat=remat)[
        "last_hidden_state"]
    logits = llama_logits(p, cfg, h)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(lp, ids[..., None], axis=-1))


args_ids = lambda i: (make_ids(i),)

# ---- full step variants (the decision rows) ----
for remat in ("dots", True, False):
    for flash in ((True, False) if remat is True else (True,)):
        @jax.jit
        def step(p, o, ids, r=remat, f=flash):
            loss, gr = jax.value_and_grad(lambda pp: loss_fn(pp, ids, r, f))(p)
            up, o2 = tx8.update(gr, o, p)
            return optax.apply_updates(p, up), o2, loss

        dt = timed(lambda ids: step(params, opt8, ids), args_ids,
                   label=f"FULL step remat={remat} flash={flash}")
        if dt:
            tok_s = batch * seq / dt
            mfu = 6 * n_params * batch * seq / dt / 197e12 * 100
            print(f"   -> {tok_s:.0f} tok/s, MFU {mfu:.1f}%", flush=True)

# ---- optimizer update alone ----
g = jax.tree.map(lambda p: (p * 1e-6).astype(p.dtype), params)


@jax.jit
def upd8(g, o, p):
    up, o2 = tx8.update(g, o, p)
    return optax.apply_updates(p, up)


timed(upd8, lambda i: (g, opt8, params), label="adamw_8bit update+apply")

# ---- fwd / fwd+bwd (params as ARGS, not constants) ----
for remat in ("dots", True, False):
    fwd = jax.jit(lambda p, i, r=remat: loss_fn(p, i, r, True))
    timed(fwd, lambda i: (params, make_ids(i)), label=f"fwd-only remat={remat}")
    vg = jax.jit(lambda p, i, r=remat: jax.value_and_grad(
        lambda pp: loss_fn(pp, i, r, True))(p)[1]["final_norm"])
    timed(vg, lambda i: (params, make_ids(i)),
          label=f"value_and_grad remat={remat}")
