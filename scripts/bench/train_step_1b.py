"""Train-step throughput on the real chip: 1.4B-class LM, remat, AdamW.

Usage: python scripts/bench/train_step_1b.py [full|dots]
  full (default) — save-nothing remat (recompute whole layers in backward)
  dots           — save matmul outputs, recompute only elementwise + flash
"""
import sys
import time
import bench
bench._enable_compile_cache()
import jax, jax.numpy as jnp
import numpy as np
import optax

REMAT = sys.argv[1] if len(sys.argv) > 1 else "full"
from dreamllm_tpu.train.optim8bit import adamw_8bit
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward, llama_logits

cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, intermediate_size=5504,
                  num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=16,
                  max_position_embeddings=2048, dtype=jnp.bfloat16)
params = jax.jit(lambda r: init_llama_params(r, cfg))(jax.random.PRNGKey(0))
n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
print(f"params: {n_params/1e9:.2f}B")

tx = adamw_8bit(3e-4)
opt_state = jax.jit(tx.init)(params)
B, S = 4, 2048

def loss_fn(p, ids, labels):
    h = llama_forward(p, cfg, input_ids=ids, use_flash=True, remat=REMAT)["last_hidden_state"]
    logits = llama_logits(p, cfg, h)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)

@jax.jit
def step(p, o, ids, labels):
    loss, g = jax.value_and_grad(loss_fn)(p, ids, labels)
    up, o = tx.update(g, o, p)
    p = optax.apply_updates(p, up)
    return p, o, loss

def run(seed):
    r = jax.random.PRNGKey(seed)
    ids = jax.random.randint(r, (B, S), 10, 31000)
    global params, opt_state
    params, opt_state, loss = step(params, opt_state, ids, ids)
    return float(loss)

print("first loss:", run(0))
ts = []
for i in range(5):
    t0 = time.perf_counter(); run(i + 1); ts.append(time.perf_counter() - t0)
ts.sort()
dt = ts[len(ts)//2]
tok_s = B * S / dt
flops = 6 * n_params * B * S
print(f"train step: {dt*1e3:.0f} ms -> {tok_s:.0f} tok/s, MFU={flops/dt/197e12*100:.1f}% (v5e peak 197T)")
