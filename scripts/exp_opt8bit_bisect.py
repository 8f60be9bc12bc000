"""Bisect the 296ms-vs-76ms gap between adamw_8bit and the fast variant.

Same harness as exp_opt8bit_variants; entries toggle one suspect each:
  inline-fast       — the known-76ms math (baseline sanity)
  +floor-positive   — adds the int8 `where` on the v codes
  +bias-corr        — adds traced-scalar bias correction divisions
  +safe-both        — adds the where(scale==0) guard (already in fast? yes)
  real-tx           — the actual adamw_8bit through tx.update+apply_updates
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_opt8bit_bisect.py
"""
import time
from functools import partial

import bench
bench._enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params
from dreamllm_tpu.train.optim8bit import adamw_8bit

BLOCK = 256
B1, B2, EPS, LR = 0.9, 0.999, 1e-8, 3e-4

cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, intermediate_size=5504,
                  num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=16,
                  max_position_embeddings=2048, dtype=jnp.bfloat16)


def blockify(x):
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, BLOCK)


def make_inline(floor_positive=False, bias_corr=False):
    def quant(xb, fp=False):
        scale = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
        safe = jnp.where(scale == 0.0, 1.0, scale)
        codes = jnp.round(xb / safe * 127.0).astype(jnp.int8)
        if fp:
            codes = jnp.where((xb > 0.0) & (codes == 0), jnp.int8(1), codes)
        return codes, scale[:, 0]

    def init_leaf(p):
        zb = blockify(jnp.zeros(p.shape, jnp.float32))
        zc = jnp.zeros(zb.shape, jnp.int8)
        zs = jnp.zeros((zb.shape[0],), jnp.float32)
        return (zc, zs, zc + 0, zs + 0)

    def upd_leaf(g, st, p, bc1, bc2):
        mc, ms, vc, vs = st
        gb = blockify(g)
        m = mc.astype(jnp.float32) * (ms[:, None] / 127.0)
        r = vc.astype(jnp.float32) * (vs[:, None] / 127.0)
        v = r * r
        m = B1 * m + (1 - B1) * gb
        v = B2 * v + (1 - B2) * gb * gb
        if bias_corr:
            u = (m / bc1) / (jnp.sqrt(v / bc2) + EPS)
        else:
            u = m / (jnp.sqrt(v) + EPS)
        n = g.size
        upd = u.reshape(-1)[:n].reshape(g.shape)
        mc, ms = quant(m)
        vc, vs = quant(jnp.sqrt(jnp.maximum(v, 0.0)), fp=floor_positive)
        return p - (LR * upd).astype(p.dtype), (mc, ms, vc, vs)
    return init_leaf, upd_leaf


def run_harness(name, init_state, step):
    p = jax.jit(lambda r: init_llama_params(r, cfg))(jax.random.PRNGKey(0))
    st = init_state(p)

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
    print(f"{name:16}: {ts[len(ts)//2]*1e3:.0f} ms", flush=True)
    del p, st, g
    import gc; gc.collect()


def inline_entry(name, **kw):
    init_leaf, upd_leaf = make_inline(**kw)

    def init_state(p):
        return jax.jit(lambda p: jax.tree.map(init_leaf, p))(p)

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(g, st, p):
        cnt, leaves_s = st
        bc1 = 1.0 - B1 ** (cnt + 1).astype(jnp.float32)
        bc2 = 1.0 - B2 ** (cnt + 1).astype(jnp.float32)
        flat_g, treedef = jax.tree.flatten(g)
        flat_s = treedef.flatten_up_to(leaves_s)
        flat_p = treedef.flatten_up_to(p)
        out = [upd_leaf(gg, ss, pp, bc1, bc2)
               for gg, ss, pp in zip(flat_g, flat_s, flat_p)]
        return (treedef.unflatten([o[0] for o in out]),
                (cnt + 1, treedef.unflatten([o[1] for o in out])))

    run_harness(name, lambda p: (jnp.zeros((), jnp.int32), init_state(p)), step)


# NB: step returns (new_p, new_st); harness expects (p, st) — matches.
def inline_flat_entry(name):
    # same math as +both but codes stored FLAT [n_pad] like Adam8bitState —
    # isolates the 1-D<->2-D int8 relayout cost
    init_leaf, upd_leaf = make_inline(floor_positive=True, bias_corr=True)

    def flatten_st(st):
        mc, ms, vc, vs = st
        return (mc.reshape(-1), ms, vc.reshape(-1), vs)

    def unflatten_st(st):
        mc, ms, vc, vs = st
        return (mc.reshape(-1, BLOCK), ms, vc.reshape(-1, BLOCK), vs)

    def init_state(p):
        return jax.jit(lambda p: jax.tree.map(
            lambda x: flatten_st(init_leaf(x)), p))(p)

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(g, st, p):
        cnt, leaves_s = st
        bc1 = 1.0 - B1 ** (cnt + 1).astype(jnp.float32)
        bc2 = 1.0 - B2 ** (cnt + 1).astype(jnp.float32)
        flat_g, treedef = jax.tree.flatten(g)
        flat_s = treedef.flatten_up_to(leaves_s)
        flat_p = treedef.flatten_up_to(p)
        out = [upd_leaf(gg, unflatten_st(ss), pp, bc1, bc2)
               for gg, ss, pp in zip(flat_g, flat_s, flat_p)]
        return (treedef.unflatten([o[0] for o in out]),
                (cnt + 1, treedef.unflatten([flatten_st(o[1]) for o in out])))

    run_harness(name, lambda p: (jnp.zeros((), jnp.int32), init_state(p)), step)


def inline_apply_entry(name):
    # 2-D state, but returns an updates tree then optax.apply_updates —
    # isolates the two-pass update/apply structure
    init_leaf, upd_leaf = make_inline(floor_positive=True, bias_corr=True)

    def init_state(p):
        return jax.jit(lambda p: jax.tree.map(init_leaf, p))(p)

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(g, st, p):
        cnt, leaves_s = st
        bc1 = 1.0 - B1 ** (cnt + 1).astype(jnp.float32)
        bc2 = 1.0 - B2 ** (cnt + 1).astype(jnp.float32)
        flat_g, treedef = jax.tree.flatten(g)
        flat_s = treedef.flatten_up_to(leaves_s)
        flat_p = treedef.flatten_up_to(p)
        outs, news = [], []
        for gg, ss, pp in zip(flat_g, flat_s, flat_p):
            np_, ns = upd_leaf(gg, ss, pp, bc1, bc2)
            outs.append((np_ - pp).astype(gg.dtype))  # u = -lr*upd
            news.append(ns)
        u = treedef.unflatten(outs)
        return optax.apply_updates(p, u), (cnt + 1, treedef.unflatten(news))

    run_harness(name, lambda p: (jnp.zeros((), jnp.int32), init_state(p)), step)


inline_entry("inline-fast")
inline_entry("+floor-positive", floor_positive=True)
inline_entry("+bias-corr", bias_corr=True)
inline_entry("+both", floor_positive=True, bias_corr=True)
inline_flat_entry("+flat-codes")
inline_apply_entry("+apply-split")

tx = adamw_8bit(3e-4)


def real_init(p):
    return jax.jit(tx.init)(p)


@partial(jax.jit, donate_argnums=(1, 2))
def real_step(g, o, p):
    u, o = tx.update(g, o, p)
    return optax.apply_updates(p, u), o


run_harness("real-tx", real_init, real_step)
