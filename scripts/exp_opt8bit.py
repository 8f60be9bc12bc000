"""Isolate the optimizer-update cost at 0.94B params (real chip).

Times jit(update+apply) for adamw_8bit vs optax.adamw on the llama param
tree. Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_opt8bit.py
"""
import time

import bench
bench._enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params
from dreamllm_tpu.train.optim8bit import adamw_8bit

cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, intermediate_size=5504,
                  num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=16,
                  max_position_embeddings=2048, dtype=jnp.bfloat16)
_p = jax.jit(lambda r: init_llama_params(r, cfg))(jax.random.PRNGKey(0))
n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(_p))
print(f"params: {n/1e9:.2f}B")
del _p


def bench_opt(name, tx):
    p = jax.jit(lambda r: init_llama_params(r, cfg))(jax.random.PRNGKey(0))
    o = jax.jit(tx.init)(p)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def upd(g, o, p):
        u, o = tx.update(g, o, p)
        p = optax.apply_updates(p, u)
        return p, o

    def mk_g(seed):
        k = jax.random.PRNGKey(seed)
        return jax.jit(lambda p, k: jax.tree.map(
            lambda x: (jax.random.normal(k, x.shape, jnp.float32) * 1e-3).astype(x.dtype),
            p))(p, k)

    g = mk_g(0)
    p, o = upd(g, o, p)
    np.asarray(jax.tree.leaves(p)[0].ravel()[0])  # sync via scalar fetch
    ts = []
    for i in range(5):
        g = mk_g(i + 1)
        np.asarray(jax.tree.leaves(g)[0].ravel()[0])
        t0 = time.perf_counter()
        p, o = upd(g, o, p)
        np.asarray(jax.tree.leaves(p)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name}: {ts[len(ts)//2]*1e3:.0f} ms  (all {[round(t*1e3) for t in ts]})",
          flush=True)


from functools import partial

bench_opt("adamw_8bit", adamw_8bit(3e-4))
import gc; gc.collect()
bench_opt("optax.adamw", optax.adamw(3e-4))
