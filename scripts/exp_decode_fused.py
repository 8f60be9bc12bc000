"""Experiment: bf16 b1 decode with fused qkv/gate-up projections.

Round-1 bench ran bf16 UNfused (46.2 tok/s) while int8 got fuse=True.
Fused layouts are initialized DIRECTLY (no concat of an unfused init) so the
transient never doubles HBM. Run: python scripts/exp_decode_fused.py [fused|unfused]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main(mode: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dreamllm_tpu.generation import SamplingConfig, generate_text
    from dreamllm_tpu.models.llama import LlamaConfig

    PREFILL, DECODE = 128, 128
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=PREFILL + DECODE, dtype=jnp.bfloat16,
    )
    h, i = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, hd = 32, 32, 128
    L = cfg.num_hidden_layers

    def _dense(rng, shape, dtype=jnp.bfloat16):
        return (jax.random.normal(rng, shape, jnp.float32) * shape[0] ** -0.5).astype(dtype)

    def make(r):
        ks = jax.random.split(r, 8)
        stack = lambda key, shape: jnp.stack(
            [_dense(k, shape) for k in jax.random.split(key, L)])
        if mode == "fused":
            layers = {
                "input_norm": jnp.ones((L, h), jnp.bfloat16),
                "post_attn_norm": jnp.ones((L, h), jnp.bfloat16),
                "wqkv": stack(ks[0], (h, (hq + 2 * hkv) * hd)),
                "wo": stack(ks[1], (hq * hd, h)),
                "w_gate_up": stack(ks[2], (h, 2 * i)),
                "w_down": stack(ks[3], (i, h)),
            }
        else:
            layers = {
                "input_norm": jnp.ones((L, h), jnp.bfloat16),
                "post_attn_norm": jnp.ones((L, h), jnp.bfloat16),
                "wq": stack(ks[0], (h, hq * hd)),
                "wk": stack(ks[4], (h, hkv * hd)),
                "wv": stack(ks[5], (h, hkv * hd)),
                "wo": stack(ks[1], (hq * hd, h)),
                "w_gate": stack(ks[2], (h, i)),
                "w_up": stack(ks[6], (h, i)),
                "w_down": stack(ks[3], (i, h)),
            }
        return {
            "embed_tokens": _dense(ks[7], (cfg.vocab_size, h)),
            "layers": layers,
            "final_norm": jnp.ones((h,), jnp.bfloat16),
            "lm_head": _dense(ks[7], (h, cfg.vocab_size)),
        }

    params = jax.jit(make)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    lens = jnp.full((1,), PREFILL, jnp.int32)
    scfg = SamplingConfig(greedy=True, max_new_tokens=DECODE, eos_token_id=-1)

    from functools import partial

    @partial(jax.jit, static_argnames=("c",))
    def gen(params, ids, lens, rng, c):
        return generate_text(params, llm_cfg=cfg, input_ids=ids,
                             prompt_lengths=lens, cfg=c, rng=rng)

    def run(seed):
        ids = jax.random.randint(jax.random.PRNGKey(seed), (1, PREFILL), 10, 31000)
        out = gen(params, ids, lens, jax.random.PRNGKey(seed), scfg)
        np.asarray(out["tokens"])

    t0 = time.perf_counter()
    run(0)
    print(f"[{mode}] compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for s in range(5):
        t0 = time.perf_counter()
        run(s + 1)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    print(f"[{mode}] median iter {dt:.3f}s -> {DECODE/dt:.1f} tok/s  (all: {[round(t,3) for t in times]})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fused")
