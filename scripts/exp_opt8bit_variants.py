"""Which part of the 8-bit AdamW update costs 276 ms at 0.94B? (real chip)

Per-leaf variants over the real llama param tree (monolithic flat graphs
crash the remote compiler):
  int8-roundtrip — current optim8bit math (dequant / adam / quant, sqrt-v)
  int8-no-sqrt   — without the sqrt-space v trick
  f32-codes      — identical structure but codes stored as f32
                   (isolates int8 conversion cost from structure cost)
  bf16-moments   — moments stored bf16, no blockwise codes (4 B/param)
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_opt8bit_variants.py
"""
import time
from functools import partial

import bench
bench._enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params

BLOCK = 256
B1, B2, EPS, LR = 0.9, 0.999, 1e-8, 3e-4

cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, intermediate_size=5504,
                  num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=16,
                  max_position_embeddings=2048, dtype=jnp.bfloat16)


def blockify(x):
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    return jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)


def quant(xb, code_dtype, sqrt_space=False):
    if sqrt_space:
        xb = jnp.sqrt(jnp.maximum(xb, 0.0))
    scale = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
    safe = jnp.where(scale == 0.0, 1.0, scale)
    return jnp.round(xb / safe * 127.0).astype(code_dtype), scale[:, 0]


def dequant(codes, scale, sqrt_space=False):
    r = codes.astype(jnp.float32) * (scale[:, None] / 127.0)
    return r * r if sqrt_space else r


def make(kind):
    if kind == "bf16-moments":
        def init_leaf(p):
            z = jnp.zeros(p.shape, jnp.bfloat16)
            return (z, z)

        def upd_leaf(g, st, p):
            m, v = st
            gb = g.astype(jnp.float32)
            mf = B1 * m.astype(jnp.float32) + (1 - B1) * gb
            vf = B2 * v.astype(jnp.float32) + (1 - B2) * gb * gb
            u = mf / (jnp.sqrt(vf) + EPS)
            return p - (LR * u).astype(p.dtype), (mf.astype(jnp.bfloat16),
                                                  vf.astype(jnp.bfloat16))
        return init_leaf, upd_leaf

    sqrt_space = kind != "int8-no-sqrt"
    code_dtype = jnp.float32 if kind == "f32-codes" else jnp.int8

    def init_leaf(p):
        zb = blockify(jnp.zeros(p.shape, jnp.float32))
        zc = jnp.zeros(zb.shape, code_dtype)
        zs = jnp.zeros((zb.shape[0],), jnp.float32)
        return (zc, zs, zc + 0, zs + 0)

    def upd_leaf(g, st, p):
        mc, ms, vc, vs = st
        gb = blockify(g)
        m = dequant(mc, ms)
        v = dequant(vc, vs, sqrt_space)
        m = B1 * m + (1 - B1) * gb
        v = B2 * v + (1 - B2) * gb * gb
        u = m / (jnp.sqrt(v) + EPS)
        n = 1
        for s in p.shape:
            n *= s
        upd = u.reshape(-1)[:n].reshape(p.shape)
        mc, ms = quant(m, code_dtype)
        vc, vs = quant(v, code_dtype, sqrt_space)
        return p - (LR * upd).astype(p.dtype), (mc, ms, vc, vs)
    return init_leaf, upd_leaf


for kind in ("int8-roundtrip", "int8-no-sqrt", "f32-codes", "bf16-moments"):
    try:
        init_leaf, upd_leaf = make(kind)
        p = jax.jit(lambda r: init_llama_params(r, cfg))(jax.random.PRNGKey(0))
        st = jax.jit(lambda p: jax.tree.map(init_leaf, p))(p)
        is_state_leaf = lambda x: isinstance(x, tuple)

        @partial(jax.jit, donate_argnums=(1, 2))
        def step(g, st, p):
            flat_g, treedef = jax.tree.flatten(g)
            flat_s = treedef.flatten_up_to(st)
            flat_p = treedef.flatten_up_to(p)
            out = [upd_leaf(gg, ss, pp) for gg, ss, pp in zip(flat_g, flat_s, flat_p)]
            return (treedef.unflatten([o[0] for o in out]),
                    treedef.unflatten([o[1] for o in out]))

        def mk_g(seed):
            k = jax.random.PRNGKey(seed)
            return jax.jit(lambda p, k: jax.tree.map(
                lambda x: (jax.random.normal(k, x.shape, jnp.float32) * 1e-3
                           ).astype(x.dtype), p))(p, k)

        g = mk_g(0)
        p, st = step(g, st, p)
        np.asarray(jax.tree.leaves(p)[0].ravel()[0])
        ts = []
        for i in range(5):
            g = mk_g(i + 1)
            np.asarray(jax.tree.leaves(g)[0].ravel()[0])
            t0 = time.perf_counter()
            p, st = step(g, st, p)
            np.asarray(jax.tree.leaves(p)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{kind:15}: {ts[len(ts)//2]*1e3:.0f} ms", flush=True)
        del p, st, g
        import gc; gc.collect()
    except Exception as e:
        print(f"{kind:15}: FAILED {str(e)[:140]}", flush=True)
