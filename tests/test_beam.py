"""Beam search tests: k=1 equals greedy, k>1 finds ≥ greedy logprob,
EOS handling, batch independence."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.generation import SamplingConfig, generate_text
from dreamllm_tpu.generation.sampler import beam_search
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward, llama_logits

TINY = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128)


def setup_module(module):
    module.cfg = LlamaConfig(**TINY)
    module.params = init_llama_params(jax.random.PRNGKey(0), module.cfg)


def seq_logprob(ids_prompt, cont):
    """fp32 logprob of continuation tokens given prompt (full forward)."""
    full = jnp.concatenate([ids_prompt, jnp.asarray([cont], jnp.int32)], axis=1)
    h = llama_forward(params, cfg, input_ids=full, use_flash=False)["last_hidden_state"]
    lp = jax.nn.log_softmax(llama_logits(params, cfg, h).astype(jnp.float32), axis=-1)
    total = 0.0
    s0 = ids_prompt.shape[1]
    for j, t in enumerate(cont):
        total += float(lp[0, s0 + j - 1, t])
    return total


def test_beam1_matches_greedy():
    ids = jnp.asarray([[3, 9, 21]])
    lens = jnp.asarray([3])
    g = generate_text(params, cfg, ids, lens,
                      SamplingConfig(greedy=True, max_new_tokens=6, eos_token_id=-1),
                      cache_dtype=jnp.float32)
    b = beam_search(params, cfg, ids, lens, num_beams=1, max_new_tokens=6,
                    eos_token_id=-1, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(g["tokens"][0]), np.asarray(b["tokens"][0]))


def test_beam4_at_least_greedy_logprob():
    ids = jnp.asarray([[3, 9, 21]])
    lens = jnp.asarray([3])
    n = 5
    g = generate_text(params, cfg, ids, lens,
                      SamplingConfig(greedy=True, max_new_tokens=n, eos_token_id=-1),
                      cache_dtype=jnp.float32)
    b = beam_search(params, cfg, ids, lens, num_beams=4, max_new_tokens=n,
                    eos_token_id=-1, length_penalty=0.0, cache_dtype=jnp.float32)
    lp_greedy = seq_logprob(ids, np.asarray(g["tokens"][0]).tolist())
    lp_beam = seq_logprob(ids, np.asarray(b["tokens"][0]).tolist())
    assert lp_beam >= lp_greedy - 1e-4


def test_batch_rows_independent():
    ids = jnp.asarray([[3, 9, 21, 0], [40, 2, 0, 0]])
    lens = jnp.asarray([3, 2])
    both = beam_search(params, cfg, ids, lens, num_beams=3, max_new_tokens=4,
                       eos_token_id=-1, cache_dtype=jnp.float32)
    solo = beam_search(params, cfg, ids[:1, :3], lens[:1], num_beams=3,
                       max_new_tokens=4, eos_token_id=-1, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(both["tokens"][0]), np.asarray(solo["tokens"][0]))


def test_eos_truncates():
    ids = jnp.asarray([[3, 9, 21]])
    lens = jnp.asarray([3])
    # find greedy's 2nd token and declare it EOS
    g = generate_text(params, cfg, ids, lens,
                      SamplingConfig(greedy=True, max_new_tokens=3, eos_token_id=-1),
                      cache_dtype=jnp.float32)
    eos = int(g["tokens"][0, 1])
    b = beam_search(params, cfg, ids, lens, num_beams=2, max_new_tokens=6,
                    eos_token_id=eos, cache_dtype=jnp.float32)
    toks = np.asarray(b["tokens"][0])
    assert eos not in toks  # stripped
