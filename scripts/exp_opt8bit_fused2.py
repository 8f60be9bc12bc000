"""Coarser-tiled fused 8-bit-Adam kernel vs the XLA formulation (real chip).

The r3 fused kernel at fixed (512, 256) tiles measured 86.9 ms vs 62.7 for
the XLA path at 0.94B (overhead-bound; and its un-aliased outputs OOMed the
full train step). This sweep re-measures after the r4 revision: row tiles up
to 2048 (DREAMLLM_FUSED_ROWS) + in-place moment buffers via
input_output_aliases.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_opt8bit_fused2.py
"""
import os
import time
from functools import partial

import bench

bench._enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params
from dreamllm_tpu.train import optim8bit
from dreamllm_tpu.train.optim8bit import adamw_8bit

cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, intermediate_size=5504,
                  num_hidden_layers=16, num_attention_heads=16,
                  num_key_value_heads=16, max_position_embeddings=2048,
                  dtype=jnp.bfloat16)


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
            lambda x: (jax.random.normal(k, x.shape, jnp.float32) * 1e-3
                       ).astype(x.dtype), p))(p, k)

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
    print(f"{name}: {1000 * float(np.median(ts)):.1f} ms "
          f"(min {1000 * min(ts):.1f})", flush=True)
    del p, o, g


KW = dict(min_8bit_size=4096,
          fp32_moments_mask=lambda params: jax.tree.map(
              lambda _: False, params))

bench_opt("xla", adamw_8bit(3e-4, **KW))
for rows in (512, 1024, 2048):
    os.environ["DREAMLLM_FUSED_ROWS"] = str(rows)
    bench_opt(f"fused r{rows}+alias", adamw_8bit(3e-4, fused_update=True, **KW))
