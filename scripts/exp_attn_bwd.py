"""Flash-attention backward sweep: Pallas bwd kernel vs XLA-recompute bwd.

Protocol matches scripts/exp_attn_kernels.py: 8 chained layers at
b4/s2048/h16/d128 causal, grad through the chain, median of 5, ms/layer.
r3 baselines on this protocol: fwd 4.10 ms/layer, fwd+bwd (XLA-recompute
bwd) 12.3 ms/layer, jax builtin Pallas bwd 15.1, splash 16.2.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
        print(f"{label:44s} FAILED {str(e)[:200]}", flush=True)
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


def chain_grad(impl):
    def f(q, k, v):
        def loss(q):
            o = q
            for _ in range(8):
                o = impl(o, k, v)
            return jnp.sum(o.astype(jnp.float32))
        return jnp.sum(jnp.abs(jax.grad(loss)(q)).astype(jnp.float32))
    return f


from dreamllm_tpu.ops import attention as A

ours = lambda q, k, v: A.flash_attention(q, k, v, causal=True)

os.environ["DREAMLLM_FLASH_BWD"] = "xla"
timed(chain_grad(ours), "fwd+bwd XLA-recompute (r3 baseline)")

os.environ["DREAMLLM_FLASH_BWD"] = "pallas"
for bq, bk in [(512, 1024), (512, 512), (1024, 1024), (256, 1024), (1024, 512)]:
    os.environ["DREAMLLM_FBWD_BQ"] = str(bq)
    os.environ["DREAMLLM_FBWD_BK"] = str(bk)
    timed(chain_grad(ours), f"fwd+bwd pallas bq={bq} bk={bk}")
