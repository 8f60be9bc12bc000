"""In-engine speculative decoding (serve/engine.py, speculative_k > 0).

Exactness contract: speculation must be invisible in the output stream —
token-identical to the non-speculative engine for greedy AND sampled
requests (acceptance is exact-match against the true per-(seed, index)
sampling stream), and token-identical to generate_text for greedy. The
reference has no speculative decoding at all (its serving path is one
request at a time, omni/eval/language_eval tools/serve.py) — this is a
beyond-parity serving feature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.generation.sampler import SamplingConfig, generate_text
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params
from dreamllm_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig


@pytest.fixture(scope="module")
def small():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, dtype=jnp.float32,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _engine(cfg, params, k, **ekw):
    scfg = SamplingConfig(greedy=True, max_new_tokens=0, eos_token_id=-1,
                          pad_token_id=0)
    ecfg = EngineConfig(slots=2, prefill_len=32, max_len=128, chunk_steps=4,
                        speculative_k=k, **ekw)
    return ContinuousBatchingEngine(params, cfg, scfg, ecfg).start()


def _ref_tokens(cfg, params, ids, max_new):
    arr = jnp.asarray([ids], jnp.int32)
    out = generate_text(
        params, cfg, arr, jnp.asarray([len(ids)], jnp.int32),
        SamplingConfig(greedy=True, max_new_tokens=max_new, eos_token_id=-1),
    )
    toks = np.asarray(out["tokens"][0])
    return list(toks[: int(out["lengths"][0])])


REPEAT_PROMPT = [1] + [5, 6, 7, 8] * 6   # n-gram-rich: drafts should accept
RANDOM_PROMPT = [1] + list(np.random.default_rng(3).integers(2, 120, 25))


@pytest.mark.parametrize("prompt", [REPEAT_PROMPT, RANDOM_PROMPT],
                         ids=["repetitive", "random"])
def test_greedy_identity_vs_generate_text(small, prompt):
    cfg, params = small
    eng = _engine(cfg, params, k=4)
    try:
        got = eng.submit(prompt, max_new_tokens=24, timeout=600)
    finally:
        eng.stop()
    assert got == _ref_tokens(cfg, params, prompt, 24)


def test_sampled_identity_vs_nonspec_engine(small):
    """Same (seed, prompt, sampling params) must yield the same tokens with
    and without speculation — the exact-match acceptance rule preserves the
    per-(seed, index) sampling stream bit-for-bit."""
    cfg, params = small
    outs = {}
    for k in (0, 4):
        eng = _engine(cfg, params, k=k)
        try:
            outs[k] = eng.submit(
                REPEAT_PROMPT, max_new_tokens=20, timeout=600,
                temperature=0.8, top_k=40, seed=1234,
            )
        finally:
            eng.stop()
    assert outs[4] == outs[0]
    assert len(outs[0]) == 20


def test_budget_exact(small):
    cfg, params = small
    eng = _engine(cfg, params, k=4)
    try:
        got = eng.submit(REPEAT_PROMPT, max_new_tokens=3, timeout=600)
        assert len(got) == 3
        got1 = eng.submit(REPEAT_PROMPT, max_new_tokens=1, timeout=600)
        assert len(got1) == 1
    finally:
        eng.stop()
    assert got[:1] == got1


def test_concurrent_spec_requests(small):
    """Two lanes with different prompts decode speculatively in the same
    chunk without cross-talk."""
    import threading

    cfg, params = small
    eng = _engine(cfg, params, k=2)
    prompts = [REPEAT_PROMPT, RANDOM_PROMPT]
    outs = {}

    def one(i):
        outs[i] = eng.submit(prompts[i], max_new_tokens=16, timeout=600)

    try:
        ts = [threading.Thread(target=one, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        eng.stop()
    for i in range(2):
        assert outs[i] == _ref_tokens(cfg, params, prompts[i], 16)


def test_lane_capacity_respected(small):
    """A lane that fills to max_len stops exactly like the plain engine."""
    cfg, params = small
    long_prompt = [1] + [5, 6, 7, 8] * 29  # 117 tokens, lane cap 128
    eng = _engine(cfg, params, k=4)
    try:
        got = eng.submit(long_prompt, max_new_tokens=64, timeout=600)
    finally:
        eng.stop()
    eng0 = _engine(cfg, params, k=0)
    try:
        ref = eng0.submit(long_prompt, max_new_tokens=64, timeout=600)
    finally:
        eng0.stop()
    assert got == ref
    assert len(got) <= 128 - len(long_prompt)


# ---------------------------------------------------------------------------
# Adaptive speculation (r4): the scheduler keeps BOTH compiled chunk
# programs and a per-(mode, occupancy) tokens/sec bandit decides per chunk.
# ---------------------------------------------------------------------------


def test_adaptive_mode_switching_preserves_greedy_identity(small):
    """Forced strict alternation between the spec and plain programs must
    not change the output stream: both run over the same state pytree and
    the plain path maintains the draft history."""
    cfg, params = small
    eng = _engine(cfg, params, k=4)
    flip = {"n": 0}
    orig_spec, orig_plain = eng.decode_chunk_fn, eng.decode_plain_fn
    assert orig_plain is not None  # speculative_adaptive default True

    def alternate():
        flip["n"] += 1
        return (orig_spec, "spec") if flip["n"] % 2 else (orig_plain, "plain")

    eng._pick_decode_fn = alternate
    try:
        got = eng.submit(REPEAT_PROMPT, max_new_tokens=24, timeout=600)
    finally:
        eng.stop()
    assert flip["n"] >= 2  # both programs actually ran
    assert got == _ref_tokens(cfg, params, REPEAT_PROMPT, 24)


def test_adaptive_disabled_keeps_single_program(small):
    cfg, params = small
    eng = _engine(cfg, params, k=2, speculative_adaptive=False)
    try:
        assert eng.decode_plain_fn is None
        got = eng.submit(REPEAT_PROMPT, max_new_tokens=12, timeout=600)
        assert got == _ref_tokens(cfg, params, REPEAT_PROMPT, 12)
        assert eng.plain_chunks == 0  # every chunk drafted
    finally:
        eng.stop()


def test_bandit_prefers_measured_faster_mode(small):
    cfg, params = small
    eng = _engine(cfg, params, k=2)
    try:
        # probe order: unseen arms first
        fn, mode = eng._pick_decode_fn()
        assert mode == "spec"
        eng._note_mode_result("spec", 0, 100.0)
        fn, mode = eng._pick_decode_fn()
        assert mode == "plain"
        eng._note_mode_result("plain", 0, 300.0)
        # plain measured 3x faster at this occupancy -> plain wins
        picks = [eng._pick_decode_fn()[1] for _ in range(10)]
        assert picks.count("plain") >= 9
        # EMA moves toward new evidence: spec suddenly much faster
        for _ in range(20):
            eng._note_mode_result("spec", 0, 900.0)
        fn, mode = eng._pick_decode_fn()
        assert mode == "spec"
    finally:
        eng.stop()
