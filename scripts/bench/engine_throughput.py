"""Continuous-batching engine throughput on 7B int8 (real chip)."""
import threading, time
import bench
bench._enable_compile_cache()
import jax, jax.numpy as jnp
import numpy as np
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, fuse_llama_params
from dreamllm_tpu.ops.quant import quantize_llama_params
from dreamllm_tpu.generation.sampler import SamplingConfig
from dreamllm_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

cfg = LlamaConfig(vocab_size=32000, hidden_size=4096, intermediate_size=11008,
                  num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
                  max_position_embeddings=512, dtype=jnp.bfloat16)
params = jax.jit(lambda r: quantize_llama_params(fuse_llama_params(init_llama_params(r, cfg))))(jax.random.PRNGKey(0))
jax.block_until_ready(params)
print("params ready")

scfg = SamplingConfig(greedy=True, max_new_tokens=0, eos_token_id=-1, pad_token_id=0)
ecfg = EngineConfig(slots=8, prefill_len=128, max_len=512, chunk_steps=16)
eng = ContinuousBatchingEngine(params, cfg, scfg, ecfg).start()

rng = np.random.default_rng(0)
# pre-generate on one thread: np.random.Generator is not thread-safe, and
# duplicate prompts would be served from the tunnel's execution cache
prompts = [[1] + rng.integers(10, 31000, 127).tolist() for _ in range(64)]
def one_request(i, out):
    out[i] = eng.submit(prompts[i], max_new_tokens=128, timeout=3000)

N = 32
# warmup: compile prefill/insert/chunk — on a prompt OUTSIDE the measured
# set (the measured run would otherwise resubmit it and could be served
# from the tunnel's execution cache, inflating tok/s)
w = {}
one_request(N, w)
print("warmup done:", len(w[N]), "tokens")
outs = {}
threads = [threading.Thread(target=one_request, args=(i, outs)) for i in range(N)]
t0 = time.perf_counter()
for t in threads: t.start()
for t in threads: t.join()
dt = time.perf_counter() - t0
total = sum(len(v) for v in outs.values())
print(f"engine: {N} reqs x 128 tok in {dt:.1f}s -> {total/dt:.1f} tok/s total; "
      f"chunks={eng.chunks_dispatched} mean_active={np.mean(eng.active_history):.2f}")
eng.stop()
