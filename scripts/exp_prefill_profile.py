"""Prefill MFU breakdown on the real chip.

Measures, at 7B shapes (b1 s2048):
  1. raw MXU ceiling: scan of 32x [2048,4096]@[4096,11008] matmuls
  2. MLP-only scan (swiglu: 3 matmuls)
  3. attention-only scan (flash kernel + qkv/o projections)
  4. full llama_forward prefill
Each timed as one jitted program, median of 5, scalar fetch.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def timed(fn, make_args, reps=5, label=""):
    """``make_args(i)`` must return fresh inputs per rep: identical
    (program, args) reruns can be served from the axon tunnel's execution
    cache without touching the chip (CLAUDE.md), which would time the
    tunnel instead of the compute."""
    import jax
    import numpy as np

    args = jax.block_until_ready(make_args(0))
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    print(f"  [{label}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(1, reps + 1):
        args = jax.block_until_ready(make_args(i))
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, S, H, I, L, HQ, HD = 1, 2048, 4096, 11008, 32, 32, 128
    key = jax.random.PRNGKey(0)

    # --- 1. raw matmul scan ceiling ---
    @jax.jit
    def mk_w(r):
        return (jax.random.normal(r, (L, H, I), jnp.float32) * 0.02).astype(jnp.bfloat16)

    W = mk_w(key)
    mk_x = jax.jit(lambda r: jax.random.normal(r, (B * S, H), jnp.bfloat16))
    x_i = lambda i: mk_x(jax.random.fold_in(key, i))

    @jax.jit
    def raw(W, x):
        def body(c, w):
            y = x @ w          # [S,H]@[H,I]
            return c + jnp.sum(y.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), W)
        return acc

    dt = timed(raw, lambda i: (W, x_i(i)), label="raw-matmul")
    fl = 2 * B * S * H * I * L
    print(f"raw matmul scan: {dt*1e3:.1f} ms -> {fl/dt/1e12:.1f} TFLOP/s", flush=True)
    del W; import gc; gc.collect()

    # --- 2. MLP scan ---
    @jax.jit
    def mk_mlp(r):
        ks = jax.random.split(r, 3)
        z = lambda k, sh: (jax.random.normal(k, sh, jnp.float32) * 0.02).astype(jnp.bfloat16)
        return {"g": z(ks[0], (L, H, I)), "u": z(ks[1], (L, H, I)), "d": z(ks[2], (L, I, H))}

    mlp = mk_mlp(key)

    @jax.jit
    def mlp_scan(p, x):
        def body(h, lw):
            y = jax.nn.silu(h @ lw["g"]) * (h @ lw["u"])
            return h + y @ lw["d"], None
        h, _ = jax.lax.scan(body, x, p)
        return jnp.sum(h.astype(jnp.float32))

    dt = timed(mlp_scan, lambda i: (mlp, x_i(i)), label="mlp")
    fl = 2 * B * S * (3 * H * I) * L
    print(f"mlp scan: {dt*1e3:.1f} ms -> {fl/dt/1e12:.1f} TFLOP/s", flush=True)
    del mlp; gc.collect()

    # --- 3. attention-only scan (proj + flash) ---
    from dreamllm_tpu.ops.attention import flash_attention

    @jax.jit
    def mk_attn(r):
        ks = jax.random.split(r, 2)
        z = lambda k, sh: (jax.random.normal(k, sh, jnp.float32) * 0.02).astype(jnp.bfloat16)
        return {"wqkv": z(ks[0], (L, H, 3 * H)), "wo": z(ks[1], (L, H, H))}

    att = mk_attn(key)
    mk_x3 = jax.jit(lambda r: jax.random.normal(r, (B, S, H), jnp.bfloat16))

    @jax.jit
    def attn_scan(p, x):
        def body(h, lw):
            qkv = h @ lw["wqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, S, HQ, HD)
            k = k.reshape(B, S, HQ, HD)
            v = v.reshape(B, S, HQ, HD)
            o = flash_attention(q, k, v, causal=True).reshape(B, S, H)
            return h + o @ lw["wo"], None
        h, _ = jax.lax.scan(body, x, p)
        return jnp.sum(h.astype(jnp.float32))

    dt = timed(attn_scan, lambda i: (att, mk_x3(jax.random.fold_in(key, i))), label="attn")
    fl = (2 * B * S * (4 * H * H) + 4 * B * HQ * S * S * HD * 0.5) * L
    print(f"attn scan: {dt*1e3:.1f} ms -> {fl/dt/1e12:.1f} TFLOP/s (matmul+flash)", flush=True)
    del att; gc.collect()

    # --- 4. full prefill ---
    from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=HQ, num_key_value_heads=HQ,
        max_position_embeddings=S, dtype=jnp.bfloat16,
    )
    params = jax.jit(lambda r: init_llama_params(r, cfg))(key)
    mk_ids = jax.jit(lambda r: jax.random.randint(r, (B, S), 10, 31000))

    @jax.jit
    def fwd(p, ids):
        h = llama_forward(p, cfg, input_ids=ids, use_flash=True)["last_hidden_state"]
        return jnp.sum(h.astype(jnp.float32))

    dt = timed(fwd, lambda i: (params, mk_ids(jax.random.fold_in(key, i))), label="full")
    fl = 2 * B * S * (4 * H * H + 3 * H * I) * L + 4 * B * HQ * S * S * HD * 0.5 * L
    print(f"full prefill: {dt*1e3:.1f} ms -> {S/dt:.0f} tok/s, {fl/dt/1e12:.1f} TFLOP/s model-flops")


if __name__ == "__main__":
    main()
