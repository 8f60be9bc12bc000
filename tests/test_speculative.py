"""Prompt-lookup speculative decoding: exact greedy equivalence + acceptance.

Beyond-parity serving feature (generation/sampler.py
generate_text_speculative): b1 decode is weight-read-bound, so verifying K
drafted tokens in one forward is ~free; exactness means the output must equal
vanilla greedy decode token-for-token on ANY input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.generation import SamplingConfig, generate_text
from dreamllm_tpu.generation.sampler import generate_text_speculative
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig(
        vocab_size=199, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=512,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _greedy(cfg, params, ids, n, **kw):
    lens = jnp.array([ids.shape[1]], jnp.int32)
    scfg = SamplingConfig(greedy=True, max_new_tokens=n, eos_token_id=-1)
    return generate_text(params, cfg, ids, lens, scfg, **kw)


def _spec(cfg, params, ids, n, K=6):
    lens = jnp.array([ids.shape[1]], jnp.int32)
    scfg = SamplingConfig(greedy=True, max_new_tokens=n, eos_token_id=-1)
    return generate_text_speculative(params, cfg, ids, lens, scfg, draft_len=K)


class TestSpeculative:
    def test_exact_match_random_prompt(self, model):
        cfg, params = model
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 10, 190)
        ref = _greedy(cfg, params, ids, 20)
        out = _spec(cfg, params, ids, 20)
        np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(ref["tokens"]))

    def test_exact_match_repetitive_prompt_and_acceptance(self, model):
        cfg, params = model
        # a highly repetitive prompt: bigram lookup should accept drafts
        pattern = np.array([[11, 12, 13, 14, 15, 16]])
        ids = jnp.asarray(np.tile(pattern, (1, 6)), jnp.int32)
        ref = _greedy(cfg, params, ids, 24)
        out = _spec(cfg, params, ids, 24)
        np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(ref["tokens"]))
        # speculation must actually engage: fewer verify steps than tokens
        assert int(out["steps"]) < 24

    def test_eos_stops_and_not_stored(self, model):
        cfg, params = model
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 10, 190)
        # find the greedy stream, then declare its 5th token to be "EOS"
        free = _greedy(cfg, params, ids, 12)
        eos = int(np.asarray(free["tokens"])[0, 4])
        lens = jnp.array([16], jnp.int32)
        scfg = SamplingConfig(greedy=True, max_new_tokens=12, eos_token_id=eos)
        ref = generate_text(params, cfg, ids, lens, scfg)
        out = generate_text_speculative(params, cfg, ids, lens, scfg, draft_len=4)
        np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(ref["tokens"]))
        assert int(out["lengths"][0]) == int(ref["lengths"][0])

    def test_non_greedy_rejected(self, model):
        cfg, params = model
        ids = jnp.ones((1, 8), jnp.int32)
        scfg = SamplingConfig(greedy=False, max_new_tokens=4)
        with pytest.raises(AssertionError):
            generate_text_speculative(params, cfg, ids, jnp.array([8]), scfg)


def test_first_token_eos_matches_greedy(model=None):
    cfg = LlamaConfig(vocab_size=199, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=512)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 10), 10, 190)
    lens = jnp.array([10], jnp.int32)
    # discover the greedy first token, then make IT the EOS id
    free = generate_text(params, cfg, ids, lens,
                         SamplingConfig(greedy=True, max_new_tokens=4, eos_token_id=-1))
    eos = int(np.asarray(free["tokens"])[0, 0])
    scfg = SamplingConfig(greedy=True, max_new_tokens=4, eos_token_id=eos)
    ref = generate_text(params, cfg, ids, lens, scfg)
    out = generate_text_speculative(params, cfg, ids, lens, scfg, draft_len=3)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(ref["tokens"]))
    assert int(out["lengths"][0]) == int(ref["lengths"][0]) == 0


def test_stop_tokens_match_greedy():
    # stop tokens (interleaved <dream_start> mode): stored, then halt —
    # speculative must reproduce generate_text exactly
    cfg = LlamaConfig(vocab_size=199, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=512)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(11), (1, 14), 10, 190)
    lens = jnp.array([14], jnp.int32)
    free = generate_text(params, cfg, ids, lens,
                         SamplingConfig(greedy=True, max_new_tokens=12, eos_token_id=-1))
    stop = int(np.asarray(free["tokens"])[0, 5])  # 6th greedy token becomes a stop
    scfg = SamplingConfig(greedy=True, max_new_tokens=12, eos_token_id=-1,
                          stop_tokens=(stop,))
    ref = generate_text(params, cfg, ids, lens, scfg)
    out = generate_text_speculative(params, cfg, ids, lens, scfg, draft_len=4)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(ref["tokens"]))
