"""13B int4 decode on one 16GB v5e — the capacity demo (bf16 needs 26GB)."""
import time
import bench
bench._enable_compile_cache()
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params
from dreamllm_tpu.ops.quant4 import quantize_int4
from dreamllm_tpu.generation import SamplingConfig, generate_text

cfg = LlamaConfig(vocab_size=32000, hidden_size=5120, intermediate_size=13824,
                  num_hidden_layers=40, num_attention_heads=40, num_key_value_heads=40,
                  max_position_embeddings=256, dtype=jnp.bfloat16)

# init one LAYER-STACKED leaf at a time, quantizing immediately: full bf16
# 13B is 26 GB and cannot coexist with its own quantized copy
tiny = LlamaConfig(**{**cfg.__dict__, "num_hidden_layers": 1})

def make_leaf(r, shape, quant):
    w = jax.random.normal(r, shape, jnp.bfloat16) * 0.02
    return quantize_int4(w) if quant else w

# discover the param tree structure from a 1-layer init on CPU abstract eval
shapes = jax.eval_shape(lambda r: init_llama_params(r, cfg), jax.random.PRNGKey(0))
QUANT = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head"}

params = {}
key = jax.random.PRNGKey(0)
for name, leaf in shapes.items():
    key, sub = jax.random.split(key)
    if name == "layers":
        layers = {}
        for ln, lv in leaf.items():
            key, sub = jax.random.split(key)
            f = jax.jit(partial(make_leaf, shape=lv.shape, quant=ln in QUANT))
            layers[ln] = f(sub)
            jax.block_until_ready(jax.tree.leaves(layers[ln]))
        params["layers"] = layers
    else:
        f = jax.jit(partial(make_leaf, shape=leaf.shape, quant=name in QUANT))
        params[name] = f(sub)
        jax.block_until_ready(jax.tree.leaves(params[name]))

n_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
print(f"13B int4 params on device: {n_bytes/1e9:.2f} GB")

PRE, DEC = 128, 128
lens = jnp.full((1,), PRE, jnp.int32)
scfg = SamplingConfig(greedy=True, max_new_tokens=DEC, eos_token_id=-1)

@partial(jax.jit, static_argnames=("c",))
def gen(params, ids, lens, rng, c):
    return generate_text(params, llm_cfg=cfg, input_ids=ids, prompt_lengths=lens, cfg=c, rng=rng)

def run(seed):
    ids = jax.random.randint(jax.random.PRNGKey(seed), (1, PRE), 10, 31000)
    out = gen(params, ids, lens, jax.random.PRNGKey(seed), scfg)
    np.asarray(out["tokens"])

run(0)
ts = []
for i in range(5):
    t0 = time.perf_counter(); run(i + 1); ts.append(time.perf_counter() - t0)
ts.sort()
print(f"13B int4 b1 decode: {DEC/ts[2]:.1f} tok/s")
