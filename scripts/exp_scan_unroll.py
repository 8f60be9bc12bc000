"""Unrolled layer scan experiment (monkey-patch lax.scan unroll)."""
import time
import bench
bench._enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np
import optax
import functools
from dreamllm_tpu.models import llama as L
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
n_params = 941_037_568
tx8 = adamw_8bit(3e-4)

_orig_scan = jax.lax.scan
UNROLL = 1

def scan_patched(f, init, xs, *a, **kw):
    kw.setdefault("unroll", UNROLL)
    return _orig_scan(f, init, xs, *a, **kw)


def loss_fn(p, ids):
    h = llama_forward(p, cfg, input_ids=ids, use_flash=True, remat="dots")[
        "last_hidden_state"]
    logits = llama_logits(p, cfg, h)
    lse = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, ids[..., None], axis=-1)[..., 0]
    return jnp.mean(lse - gold)


def run(unroll, reps=5):
    global UNROLL
    UNROLL = unroll
    L.jax.lax.scan = scan_patched  # llama.py resolves jax.lax.scan at call time

    @jax.jit
    def step(p, o, ids):
        loss, gr = jax.value_and_grad(loss_fn)(p, ids)
        up, o2 = tx8.update(gr, o, p)
        return optax.apply_updates(p, up), o2, loss

    step_d = jax.jit(step, donate_argnums=(0, 1))
    p = jax.jit(lambda r: init_llama_params(r, cfg))(jax.random.PRNGKey(0))
    o = jax.jit(tx8.init)(p)
    ids_f = lambda i: jax.random.randint(jax.random.PRNGKey(i), (batch, seq), 10, 31000)
    label = f"FULL dots donate unroll={unroll}"
    try:
        t0 = time.perf_counter()
        p, o, l = step_d(p, o, ids_f(0))
        print(f"  [{label}: warm {time.perf_counter()-t0:.0f}s loss={float(l):.3f}]", flush=True)
    except Exception as e:
        print(f"{label:44s} FAILED {str(e)[:150]}", flush=True)
        return
    finally:
        jax.lax.scan = _orig_scan
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        p, o, l = step_d(p, o, ids_f(i + 1))
        l = float(l)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    print(f"{label:44s} {dt*1e3:8.1f} ms -> {batch*seq/dt:.0f} tok/s, "
          f"MFU {6*n_params*batch*seq/dt/197e12*100:.1f}%", flush=True)


run(16)
run(4)
