"""Chained attention sweep: true per-layer costs (dispatch amortized, scalar fetch)."""
import functools
import time

import bench
bench._enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np

b, s, h, d = 4, 2048, 16, 128
q0 = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d), jnp.bfloat16)
k0 = jax.random.normal(jax.random.PRNGKey(3), (b, s, h, d), jnp.bfloat16)
v0 = jax.random.normal(jax.random.PRNGKey(4), (b, s, h, d), jnp.bfloat16)
args = lambda i: ((q0 * (1 + i * 1e-2)).astype(jnp.bfloat16), k0, v0)
FL8 = 8 * 4 * b * h * s * s * d * 0.5


def timed(make, label, reps=5):
    jf = jax.jit(make)
    try:
        t0 = time.perf_counter()
        np.asarray(jf(*args(0)))
        warm = time.perf_counter() - t0
    except Exception as e:
        print(f"{label:44s} FAILED {str(e)[:120]}", flush=True)
        return None
    ts = []
    for i in range(reps):
        a = args(i + 1)
        t0 = time.perf_counter()
        np.asarray(jf(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    print(f"{label:44s} {dt*1e3/8:7.2f} ms/layer ({FL8/dt/1e12:6.1f} TF/s fwd-eq)  warm {warm:.0f}s",
          flush=True)
    return dt


def chain(impl):
    def f(q, k, v):
        o = q
        for _ in range(8):
            o = impl(o, k, v)
        return jnp.sum(o.astype(jnp.float32))
    return f


def chain_grad(impl):
    def f(q, k, v):
        def loss(q):
            o = q
            for _ in range(8):
                o = impl(o, k, v)
            return jnp.sum(o.astype(jnp.float32))
        return jnp.sum(jnp.abs(jax.grad(loss)(q)).astype(jnp.float32))
    return f


# raw MXU ceiling: same matmul shapes as attention, no softmax
def raw_attn_mm(q, k, v):
    sc = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    return jnp.einsum("bhqk,bkhd->bqhd", sc.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


timed(chain(raw_attn_mm), "raw einsum qk+pv (no softmax, full rect)")

from dreamllm_tpu.ops.attention import _flash_attention_tpu, flash_attention

ours = lambda q, k, v: flash_attention(q, k, v, causal=True)
ours_ns = functools.partial(_flash_attention_tpu, segment_ids=None,
                            kv_segment_ids=None, causal=True, sm_scale=d**-0.5,
                            block_q=512, block_k=1024)
timed(chain(ours), "ours default fwd")
timed(chain(ours_ns), "ours noseg 512/1024 fwd")

from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jflash


def jax_flash(q, k, v):
    o = jflash(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
               v.transpose(0, 2, 1, 3), causal=True, sm_scale=d ** -0.5)
    return o.transpose(0, 2, 1, 3)


timed(chain(jax_flash), "jax builtin flash fwd")
timed(chain_grad(jax_flash), "jax builtin flash fwd+bwd (pallas bwd)")
timed(chain_grad(ours), "ours fwd+bwd (xla-recompute bwd)")

from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as sk, splash_attention_mask as sm,
)


def make_splash():
    mask = sm.MultiHeadMask([sm.CausalMask((s, s)) for _ in range(h)])
    return sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1)


try:
    splash = make_splash()

    def splash_attn(q, k, v):
        # splash wants BHSD with scaled q
        qs = (q * (d ** -0.5)).transpose(0, 2, 1, 3)
        o = jax.vmap(splash)(qs, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))
        return o.transpose(0, 2, 1, 3)

    timed(chain(splash_attn), "jax splash fwd")
    timed(chain_grad(splash_attn), "jax splash fwd+bwd")
except Exception as e:
    print("splash setup FAILED", str(e)[:200], flush=True)
