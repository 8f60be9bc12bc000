"""Continuous-batching engine (serve/engine.py) + vector-index cache writes.

Greedy parity: engine outputs must be token-identical to generate_text.
Continuity: a request admitted mid-decode is served without waiting for the
earlier batch to drain.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.generation.sampler import SamplingConfig, generate_text
from dreamllm_tpu.models.llama import (
    LlamaConfig,
    cache_write,
    init_kv_cache,
    init_llama_params,
    llama_forward,
)
from dreamllm_tpu.serve.engine import (
    ContinuousBatchingEngine,
    EngineConfig,
    init_engine_state,
    make_engine_fns,
)


@pytest.fixture(scope="module")
def small():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, dtype=jnp.float32,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _ref_tokens(cfg, params, ids, max_new, **kw):
    arr = jnp.asarray([ids], jnp.int32)
    out = generate_text(
        params, cfg, arr, jnp.asarray([len(ids)], jnp.int32),
        SamplingConfig(greedy=True, max_new_tokens=max_new, **kw),
    )
    toks = np.asarray(out["tokens"][0])
    # generate_text's `lengths` is the exact per-row emit count (a genuinely
    # generated pad-id token — 0 = <unk> — counts; post-EOS fill does not)
    return list(toks[: int(out["lengths"][0])])


# ---------------------------------------------------------------------------
# cache_write vector-index path
# ---------------------------------------------------------------------------


def test_cache_write_vector_matches_scalar():
    buf = jnp.zeros((3, 8, 2), jnp.float32)
    val = jnp.ones((3, 2, 2))
    a = cache_write(buf, val, jnp.int32(4))
    b = cache_write(buf, val, jnp.full((3,), 4, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = cache_write(buf, val, jnp.asarray([0, 2, 6], jnp.int32))
    c = np.asarray(c)
    assert c[0, :2].sum() == 4 and c[1, 2:4].sum() == 4 and c[2, 6:8].sum() == 4
    assert c.sum() == 12


def test_forward_vector_index_matches_scalar(small):
    cfg, params = small
    b, s = 2, 1
    cache = init_kv_cache(cfg, b, 16, dtype=jnp.float32)
    # pre-fill both rows identically to offset 3
    ids0 = jnp.asarray([[5, 6, 7], [5, 6, 7]], jnp.int32)
    out = llama_forward(params, cfg, input_ids=ids0, kv_cache=cache)
    cache_s = out["kv_cache"]
    cache_v = dict(cache_s)
    cache_v["index"] = jnp.full((b,), 3, jnp.int32)
    tok = jnp.asarray([[9], [11]], jnp.int32)
    o_s = llama_forward(params, cfg, input_ids=tok, kv_cache=cache_s)
    o_v = llama_forward(params, cfg, input_ids=tok, kv_cache=cache_v)
    np.testing.assert_allclose(
        np.asarray(o_s["last_hidden_state"]),
        np.asarray(o_v["last_hidden_state"]), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(o_v["kv_cache"]["index"]), [4, 4])


# ---------------------------------------------------------------------------
# Engine parity + scheduling
# ---------------------------------------------------------------------------


def _engine(cfg, params, **kw):
    scfg = SamplingConfig(greedy=True, max_new_tokens=0, eos_token_id=2,
                          pad_token_id=0, stop_tokens=kw.pop("stop_tokens", ()))
    ecfg = EngineConfig(
        slots=kw.pop("slots", 2), prefill_len=16, max_len=64,
        chunk_steps=kw.pop("chunk_steps", 4),
        cache_dtype=kw.pop("cache_dtype", "bfloat16"),
        prefix_cache_entries=kw.pop("prefix_cache_entries", 0),
    )
    return ContinuousBatchingEngine(params, cfg, scfg, ecfg)


def test_engine_int8_kv_cache(small):
    """The engine's int8-cache mode (long-context serving) decodes close to
    the bf16 reference — same argmax path on a quantized cache."""
    cfg, params = small
    eng = _engine(cfg, params, cache_dtype="int8").start()
    try:
        got = eng.submit([1, 17, 23, 42], max_new_tokens=10)
        assert len(got) == 10
        ref = _ref_tokens(cfg, params, [1, 17, 23, 42], 10)
        # int8 cache rounds attention reads; sequences may diverge late but
        # must agree early (first tokens read an almost-exact cache)
        assert got[:2] == ref[:2]
    finally:
        eng.stop()


def test_engine_greedy_parity_single(small):
    cfg, params = small
    eng = _engine(cfg, params).start()
    try:
        prompt = [1, 17, 23, 42]
        got = eng.submit(prompt, max_new_tokens=12)
        ref = _ref_tokens(cfg, params, prompt, 12)
        assert got == ref and len(got) == 12
    finally:
        eng.stop()


def test_engine_greedy_parity_concurrent(small):
    cfg, params = small
    eng = _engine(cfg, params, slots=3).start()
    prompts = [[1, 17, 23, 42], [1, 99, 3], [1, 55, 56, 57, 58]]
    budgets = [10, 14, 7]
    results = [None] * 3

    def worker(i):
        results[i] = eng.submit(prompts[i], max_new_tokens=budgets[i])

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
            time.sleep(0.05)  # staggered arrivals
        for t in threads:
            t.join(timeout=300)
        for i in range(3):
            ref = _ref_tokens(cfg, params, prompts[i], budgets[i])
            assert results[i] == ref, f"request {i}: {results[i]} != {ref}"
    finally:
        eng.stop()


def test_engine_admits_mid_decode(small):
    """A request arriving while another decodes is admitted before the first
    finishes (the continuous-batching property)."""
    cfg, params = small
    eng = _engine(cfg, params, slots=2, chunk_steps=2).start()
    try:
        long_res: list = []
        t1 = threading.Thread(
            target=lambda: long_res.append(eng.submit([1, 17], max_new_tokens=40))
        )
        t1.start()
        # wait until the first request is mid-decode
        for _ in range(200):
            if eng.chunks_dispatched >= 1:
                break
            time.sleep(0.02)
        short = eng.submit([1, 99, 3], max_new_tokens=4, timeout=300)
        t1.join(timeout=300)
        assert short == _ref_tokens(cfg, params, [1, 99, 3], 4)
        assert long_res and long_res[0] == _ref_tokens(cfg, params, [1, 17], 40)
        # both were in flight simultaneously at some point
        assert max(eng.active_history) == 2
    finally:
        eng.stop()


def test_engine_more_requests_than_slots(small):
    cfg, params = small
    eng = _engine(cfg, params, slots=2).start()
    prompts = [[1, i + 3] for i in range(5)]
    results = [None] * 5

    def worker(i):
        results[i] = eng.submit(prompts[i], max_new_tokens=6)

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        for i in range(5):
            assert results[i] == _ref_tokens(cfg, params, prompts[i], 6)
    finally:
        eng.stop()


def test_engine_streaming_callback(small):
    cfg, params = small
    eng = _engine(cfg, params).start()
    try:
        seen = []
        got = eng.submit([1, 17, 23], max_new_tokens=8, stream=seen.append)
        assert seen == got
    finally:
        eng.stop()


def test_engine_raising_stream_callback_does_not_kill_scheduler(small):
    """A stream callback that raises is disabled (logged) — the request
    still completes with all its tokens, and the engine keeps serving."""
    cfg, params = small
    eng = _engine(cfg, params).start()
    try:
        calls = []

        def bad_stream(t):
            calls.append(t)
            raise RuntimeError("client went away")

        got = eng.submit([1, 17, 23], max_new_tokens=8, stream=bad_stream)
        assert len(got) == 8 and len(calls) == 1  # disabled after first raise
        # engine survived: a follow-up request is served normally
        again = eng.submit([1, 30, 40], max_new_tokens=4)
        assert len(again) == 4
    finally:
        eng.stop()


class _ByteTokenizer:
    """Toy tokenizer: one token per byte-ish char code (bounded to vocab)."""

    bos_token_id = 1

    def encode(self, text):
        return [2 + (ord(c) % 100) for c in text]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


def test_engine_with_sharded_params(small):
    """Multi-chip serving: the engine's three compiled programs accept
    mesh-sharded params (XLA inserts the tp/fsdp collectives) and greedy
    output stays token-identical to the unsharded reference."""
    from dreamllm_tpu.parallel.mesh import MeshConfig, create_mesh
    from dreamllm_tpu.parallel.sharding import param_shardings

    cfg, params = small
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tp=2))
    sp = jax.tree.map(
        jax.device_put, params, param_shardings(params, mesh, min_shard_size=0)
    )
    eng = _engine(cfg, sp, slots=2).start()
    try:
        prompt = [1, 17, 23, 42]
        got = eng.submit(prompt, max_new_tokens=10)
        assert got == _ref_tokens(cfg, params, prompt, 10)
    finally:
        eng.stop()


def test_engine_backed_http_server(small):
    from dreamllm_tpu.serve import ModelServer, OnlineClient

    cfg, params = small
    eng = _engine(cfg, params)
    server = ModelServer(engine=eng, tokenizer=_ByteTokenizer(), port=0).start()
    try:
        client = OnlineClient(f"http://127.0.0.1:{server.port}")
        assert client.healthy()
        text = client.generate("hi", max_new_tokens=6)
        tok = _ByteTokenizer()
        ref = _ref_tokens(cfg, params, [1] + tok.encode("hi"), 6)
        assert text == tok.decode(ref).strip()
        # concurrent requests through the HTTP layer
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(
                lambda p: client.generate(p, max_new_tokens=5),
                ["a", "bb", "ccc", "dddd"],
            ))
        for p, got in zip(["a", "bb", "ccc", "dddd"], outs):
            ref = _ref_tokens(cfg, params, [1] + tok.encode(p), 5)
            assert got == tok.decode(ref).strip()
        # per-request sampling fields ride through the JSON contract to the
        # engine's per-row sampler (greedy neighbors stay unaffected — the
        # parity assertions above already ran concurrently in other lanes)
        sampled = client.generate("hi", max_new_tokens=5, temperature=1.2, top_k=6)
        assert isinstance(sampled, str)
    finally:
        server.stop()


def test_engine_http_sse_streaming(small):
    """stream=true on the engine /generate yields SSE deltas that assemble
    to exactly the non-streamed greedy text; bad params are still a 400
    (rejected before any SSE bytes), and streams run concurrently."""
    import urllib.error

    from dreamllm_tpu.serve import ModelServer, OnlineClient

    cfg, params = small
    eng = _engine(cfg, params)
    tok = _ByteTokenizer()
    server = ModelServer(engine=eng, tokenizer=tok, port=0).start()
    try:
        client = OnlineClient(f"http://127.0.0.1:{server.port}")
        deltas = list(client.generate_stream("hello", max_new_tokens=8))
        assert len(deltas) > 1  # actually incremental, not one blob
        ref = tok.decode(_ref_tokens(cfg, params, [1] + tok.encode("hello"), 8))
        assert "".join(deltas) == ref  # final strip() only affects edges
        # invalid sampling on the streaming path → clean JSON 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            list(client.generate_stream("x", max_new_tokens=4, top_p=0.0))
        assert ei.value.code == 400
        # two concurrent streams don't interleave each other's tokens
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(2) as ex:
            f1 = ex.submit(lambda: "".join(client.generate_stream("aa", max_new_tokens=6)))
            f2 = ex.submit(lambda: "".join(client.generate_stream("bbbb", max_new_tokens=6)))
            for prompt, fut in (("aa", f1), ("bbbb", f2)):
                ref = tok.decode(_ref_tokens(cfg, params, [1] + tok.encode(prompt), 6))
                assert fut.result() == ref
    finally:
        server.stop()


def test_engine_chunked_prefill_long_prompt(small):
    """A prompt longer than prefill_len prefills in chunks and still matches
    the one-shot reference token-for-token."""
    cfg, params = small
    eng = _engine(cfg, params).start()  # prefill_len=16
    try:
        prompt = [1] + list(range(5, 40))  # 36 tokens = 3 chunks (16/16/4)
        got = eng.submit(prompt, max_new_tokens=8)
        assert got == _ref_tokens(cfg, params, prompt, 8)
    finally:
        eng.stop()


def test_engine_overlong_prompt_left_truncates(small):
    cfg, params = small
    eng = _engine(cfg, params).start()  # max_len=64
    try:
        prompt = [1] + list(range(3, 103))  # 101 tokens > 63
        got = eng.submit(prompt, max_new_tokens=4)
        # lane keeps the last 63 tokens; budget clamps to the 1 free slot
        assert len(got) == 1
        assert got == _ref_tokens(cfg, params, prompt[-63:], 4)[:1]
    finally:
        eng.stop()


def test_engine_rejects_bad_sampling_params(small):
    """Client-controlled sampling params are range-checked at submit: top_p
    <= 0 would mask every logit to -inf (max_new_tokens copies of <unk>),
    NaN temperature would poison the row — both must fail fast."""
    cfg, params = small
    eng = _engine(cfg, params).start()
    try:
        with pytest.raises(ValueError, match="top_p"):
            eng.submit([1, 5], max_new_tokens=2, top_p=0.0)
        with pytest.raises(ValueError, match="temperature"):
            eng.submit([1, 5], max_new_tokens=2, temperature=float("nan"))
        with pytest.raises(ValueError, match="top_k"):
            eng.submit([1, 5], max_new_tokens=2, top_k=-3)
        # the engine still serves after rejected submits
        assert eng.submit([1, 5], max_new_tokens=2) == _ref_tokens(
            cfg, params, [1, 5], 2)
    finally:
        eng.stop()


def test_engine_rejects_bad_config_and_empty_prompt(small):
    cfg, params = small
    with pytest.raises(ValueError, match="multiple of prefill_len"):
        ContinuousBatchingEngine(
            params, cfg, SamplingConfig(greedy=True),
            EngineConfig(slots=1, prefill_len=16, max_len=100),
        )
    eng = _engine(cfg, params).start()
    try:
        with pytest.raises(ValueError, match="empty prompt"):
            eng.submit([], max_new_tokens=4)
    finally:
        eng.stop()


def test_engine_double_start_is_noop(small):
    cfg, params = small
    eng = _engine(cfg, params).start()
    try:
        t1 = eng._thread
        eng.start()  # ModelServer.start() after a warmup start()
        assert eng._thread is t1
    finally:
        eng.stop()


def test_engine_loop_error_fails_requests_and_recovers(small):
    """A decode-chunk exception poisons in-flight requests with the error
    (not a silent timeout), frees their lanes, and the engine keeps serving."""
    cfg, params = small
    eng = _engine(cfg, params)
    real = eng.decode_chunk_fn
    calls = {"n": 0}

    def flaky(params_, state):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected chunk failure")
        return real(params_, state)

    eng.decode_chunk_fn = flaky
    eng.start()
    try:
        with pytest.raises(RuntimeError, match="injected"):
            eng.submit([1, 17, 23], max_new_tokens=4, timeout=60)
        assert sorted(eng._free) == [0, 1]  # lane freed, not leaked
        # engine still serves afterwards
        got = eng.submit([1, 17, 23], max_new_tokens=4, timeout=120)
        assert got == _ref_tokens(cfg, params, [1, 17, 23], 4)
    finally:
        eng.stop()


def test_engine_routes_pad_id_tokens(small):
    """A genuinely generated token equal to pad_token_id must reach the
    output (routing is by validity mask, not token value)."""
    cfg, params = small
    eng = _engine(cfg, params)
    real = eng.decode_chunk_fn

    def forced(params_, state):
        state, toks, valid, active = real(params_, state)
        # overwrite the first chunk's tokens with pad-id where valid
        toks = jnp.where(valid, jnp.zeros_like(toks), toks)
        return state, toks, valid, active

    eng.decode_chunk_fn = forced
    eng.start()
    try:
        got = eng.submit([1, 17], max_new_tokens=3, timeout=120)
        assert got.count(0) >= 3  # pad-id tokens delivered, not dropped
    finally:
        eng.stop()


@pytest.mark.slow
def test_sample_token_per_row_semantics():
    """Per-row sampler: greedy rows return argmax regardless of neighbors;
    top-k / top-p rows only ever sample inside their own truncated support."""
    from dreamllm_tpu.generation.sampler import sample_token_per_row

    v = 16
    base = jnp.asarray(
        [3.0, 2.5, 2.0, 0.0] + [-5.0] * (v - 4), jnp.float32
    )
    logits = jnp.stack([base, base, base, base])
    greedy = jnp.asarray([True, False, False, False])
    temp = jnp.asarray([1.0, 1.0, 1.0, 0.25], jnp.float32)
    top_k = jnp.asarray([0, 2, 0, 0], jnp.int32)
    top_p = jnp.asarray([1.0, 1.0, 0.5, 1.0], jnp.float32)
    seen = [set() for _ in range(4)]
    for i in range(60):
        toks = np.asarray(sample_token_per_row(
            logits, jax.random.PRNGKey(i), greedy, temp, top_k, top_p))
        for r in range(4):
            seen[r].add(int(toks[r]))
    assert seen[0] == {0}                      # greedy row: argmax only
    assert seen[1] <= {0, 1}                   # top-k=2: top-2 support only
    # top-p=0.5: softmax(base) gives p(top-1)≈0.493 < 0.5, so the smallest
    # prefix reaching 0.5 is the top-2 — exactly {0, 1}
    assert seen[2] == {0, 1}
    assert seen[3] <= {0, 1, 2, 3} and len(seen[3]) >= 2  # sharpened but free


@pytest.mark.slow
def test_sample_token_per_row_matches_scalar_on_kth_ties():
    """Ties at the k-th largest logit: the scalar path keeps ALL tied
    entries (cut is `l < kth`), and the per-row path's top-p mass must be
    computed over the same tied support — the combined top-k=2 + top-p=0.6
    support is {0,1,2,3}, not just {0}."""
    from dreamllm_tpu.generation.sampler import (
        SamplingConfig, sample_token, sample_token_per_row,
    )

    v = 12
    row = jnp.asarray([3.0, 2.0, 2.0, 2.0] + [-9.0] * (v - 4), jnp.float32)
    scfg = SamplingConfig(greedy=False, temperature=1.0, top_k=2, top_p=0.6)
    scalar_seen, row_seen = set(), set()
    for i in range(80):
        rng = jax.random.PRNGKey(i)
        scalar_seen.add(int(np.asarray(sample_token(row[None], rng, scfg))[0]))
        row_seen.add(int(np.asarray(sample_token_per_row(
            row[None], rng,
            jnp.asarray([False]), jnp.asarray([1.0], jnp.float32),
            jnp.asarray([2], jnp.int32), jnp.asarray([0.6], jnp.float32)))[0]))
    assert scalar_seen == row_seen, (scalar_seen, row_seen)
    assert row_seen == {0, 1, 2, 3}


def test_engine_per_request_sampling(small):
    """A greedy request stays token-identical to the reference while a
    temperature-sampled request decodes in the SAME chunks; the sampled
    one returns the full budget of in-vocab tokens."""
    cfg, params = small
    eng = _engine(cfg, params, slots=2).start()
    results = {}

    def greedy_worker():
        results["greedy"] = eng.submit([1, 17, 23, 42], max_new_tokens=12)

    def sampled_worker():
        results["sampled"] = eng.submit(
            [1, 99, 3], max_new_tokens=10, temperature=1.3, top_k=8)

    try:
        ts = [threading.Thread(target=greedy_worker),
              threading.Thread(target=sampled_worker)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert results["greedy"] == _ref_tokens(cfg, params, [1, 17, 23, 42], 12)
        # the sampled lane may hit EOS early (it samples freely) but must
        # finish cleanly within its budget
        assert "sampled" in results and len(results["sampled"]) <= 10
        assert all(0 <= t < cfg.vocab_size for t in results["sampled"])
    finally:
        eng.stop()


def test_engine_slot_recycling_no_leak(small):
    """Lanes freed by finished requests are reused with clean metadata: a
    second wave of requests on recycled lanes still matches the reference."""
    cfg, params = small
    eng = _engine(cfg, params, slots=2).start()
    try:
        for wave in range(2):
            p = [1, 40 + wave]
            assert eng.submit(p, max_new_tokens=5) == _ref_tokens(cfg, params, p, 5)
        assert sorted(eng._free) == [0, 1]
    finally:
        eng.stop()


def test_engine_prefix_cache_exact_and_bounded(small):
    """Prefix caching: requests sharing a token-exact full-chunk prefix skip
    its prefill but stay token-identical to the uncached reference; the LRU
    stays bounded; a cached entry survives later donating calls."""
    cfg, params = small
    eng = _engine(cfg, params, prefix_cache_entries=2)  # P=16
    eng.start()
    try:
        sys_prompt = [1] + list(range(20, 51))        # 32 tokens = 2 chunks
        a = sys_prompt + [60, 61, 62]
        b = sys_prompt + [70, 71]
        got_a = eng.submit(a, max_new_tokens=8)
        assert eng.prefix_hits == 0 and eng.prefix_misses == 1
        got_b = eng.submit(b, max_new_tokens=8)       # hits the 32-tok prefix
        assert eng.prefix_hits == 1
        assert got_a == _ref_tokens(cfg, params, a, 8)
        assert got_b == _ref_tokens(cfg, params, b, 8)
        # resubmitting A hits too (entry not corrupted by B's prefill
        # donations) and stays exact
        assert eng.submit(a, max_new_tokens=8) == got_a
        assert eng.prefix_hits == 2
        # LRU bound: distinct prefixes evict the oldest, never grow past cap
        for base in (100, 105, 110):
            eng.submit([1] + [base] * 33, max_new_tokens=2)
        assert len(eng._prefix_cache) <= 2
        # short prompts (< one full chunk + 1) bypass the cache entirely
        hits = eng.prefix_hits
        eng.submit([1, 5, 9], max_new_tokens=2)
        eng.submit([1, 5, 9], max_new_tokens=2)
        assert eng.prefix_hits == hits
    finally:
        eng.stop()


def test_engine_prefix_cache_partial_match_extends(small):
    """A hit on a SHORTER cached prefix still stores this prompt's own
    longer prefix, and outputs stay exact."""
    cfg, params = small
    eng = _engine(cfg, params, prefix_cache_entries=4)
    eng.start()
    try:
        head16 = [1] + list(range(20, 35))            # exactly one chunk
        eng.submit(head16 + [40], max_new_tokens=2)   # stores 16-tok prefix
        long_prompt = head16 + list(range(40, 56)) + [90, 91]  # 32-tok prefix
        got = eng.submit(long_prompt, max_new_tokens=8)
        assert eng.prefix_hits == 1                   # reused the 16-tok entry
        assert got == _ref_tokens(cfg, params, long_prompt, 8)
        assert any(len(k) == 32 for k in eng._prefix_cache)  # extended store
        got2 = eng.submit(long_prompt + [99], max_new_tokens=8)
        assert eng.prefix_hits == 2                   # now hits the 32-tok one
        assert got2 == _ref_tokens(cfg, params, long_prompt + [99], 8)
        # storing the covering 32-token entry evicted the redundant 16-token
        # one (each entry is a lane-size HBM buffer)
        assert all(len(k) == 32 for k in eng._prefix_cache)
        # the REVERSE: a request sharing only the first chunk of the LONGER
        # stored entry hits it — this prefills on top of the entry's stale
        # tail rows, which sit at future positions (causally masked) and get
        # seg-masked at insert; output must stay exact
        short = head16 + [77, 78, 79]
        got3 = eng.submit(short, max_new_tokens=8)
        assert eng.prefix_hits == 3
        assert got3 == _ref_tokens(cfg, params, short, 8)
    finally:
        eng.stop()


def test_engine_sse_holds_back_incomplete_chars(small):
    """Byte-level-BPE-style tokenizers decode a half-emitted character to
    U+FFFD; the SSE path must hold those deltas back and still assemble to
    the authoritative final text (no � ever reaches the client)."""
    from dreamllm_tpu.serve import ModelServer, OnlineClient

    class PairTokenizer:
        """Decodes token PAIRS to one char; a trailing odd token is an
        incomplete character (U+FFFD), like a split UTF-8 sequence."""

        bos_token_id = 1

        def encode(self, text):
            out = []
            for c in text:
                out += [2 + (ord(c) % 50), 60 + (ord(c) % 50)]
            return out

        def decode(self, ids):
            s = "".join(
                chr(97 + (ids[i] + ids[i + 1]) % 26)
                for i in range(0, len(ids) - 1, 2)
            )
            if len(ids) % 2:
                s += "�"
            return s

    cfg, params = small
    eng = _engine(cfg, params)
    server = ModelServer(engine=eng, tokenizer=PairTokenizer(), port=0).start()
    try:
        client = OnlineClient(f"http://127.0.0.1:{server.port}")
        deltas = list(client.generate_stream("hi", max_new_tokens=9))
        # incomplete characters are held back mid-stream; only the FINAL
        # residue flush may carry one (the authoritative text genuinely
        # ends mid-character at an odd token budget — so does the
        # non-streamed path's output)
        assert all("�" not in d for d in deltas[:-1])
        whole = client.generate("hi", max_new_tokens=9)
        assert "".join(deltas).strip() == whole
    finally:
        server.stop()


def test_engine_embeds_prompt_matches_ids_prompt(small):
    """submit(prompt_embeds=token_embeddings(ids)) is token-identical to
    submit(ids) — the multimodal prompt path shares the lane machinery."""
    cfg, params = small
    eng = _engine(cfg, params).start()
    try:
        prompt = [1, 17, 23, 42, 55]
        ref = eng.submit(prompt, max_new_tokens=10)
        embeds = np.asarray(params["embed_tokens"])[np.asarray(prompt)]
        got = eng.submit(prompt_embeds=embeds, max_new_tokens=10)
        assert got == ref == _ref_tokens(cfg, params, prompt, 10)
        # chunked: a prompt longer than prefill_len (16) via embeds
        long_p = [1] + list(range(5, 40))
        ref2 = eng.submit(long_p, max_new_tokens=8)
        emb2 = np.asarray(params["embed_tokens"])[np.asarray(long_p)]
        assert eng.submit(prompt_embeds=emb2, max_new_tokens=8) == ref2
    finally:
        eng.stop()


def test_engine_seeded_sampling_reproducible(small):
    """submit(seed=) pins the request's sampling stream: same seed → same
    output regardless of slot placement or co-tenant traffic; different
    seed → a different stream. Keys derive from (seed, sample index), not
    engine state."""
    cfg, params = small
    eng = _engine(cfg, params).start()
    try:
        p = [1, 17, 23, 42]
        a = eng.submit(p, max_new_tokens=16, temperature=1.5, seed=7)
        # interleave other traffic so the repeat lands in a different
        # scheduling context (slot churn, different admit counter)
        eng.submit([1, 88, 3], max_new_tokens=6)
        b = eng.submit(p, max_new_tokens=16, temperature=1.5, seed=7)
        c = eng.submit(p, max_new_tokens=16, temperature=1.5, seed=8)
        assert a == b
        assert a != c  # 16 draws over a 128-vocab at T=1.5: collision ~0
        # unseeded sampled requests get per-admission streams (not identical)
        d = eng.submit(p, max_new_tokens=16, temperature=1.5)
        e = eng.submit(p, max_new_tokens=16, temperature=1.5)
        assert d != e
    finally:
        eng.stop()


def test_stop_with_inflight_deactivates_lanes_for_restart(small):
    """stop() fails in-flight requests AND clears their lanes' device
    active flags: a stop()+start() must not resume zombie lanes that burn
    decode work on garbage nobody routes."""
    import threading

    cfg, params = small
    eng = _engine(cfg, params).start()
    try:
        errs = {}

        def long_req():
            try:
                eng.submit([1, 5, 9], max_new_tokens=48, timeout=60)
            except Exception as e:
                errs["e"] = e

        t = threading.Thread(target=long_req)
        t.start()
        # deterministic: block until the lane is REGISTERED (a fixed-window
        # poll of _by_slot expired under full-suite load, racing stop()'s
        # contract — the r4 flake)
        assert eng.wait_for_admissions(1, timeout=60)
        eng.stop()
        t.join(timeout=30)
        assert "e" in errs and "stopped" in str(errs["e"])
        assert not bool(np.asarray(eng.state["active"]).any())
        # a restart serves correctly with no zombie lanes
        eng.start()
        prompt = [1, 17, 23]
        assert eng.submit(prompt, max_new_tokens=6) == _ref_tokens(
            cfg, params, prompt, 6)
    finally:
        eng.stop()


def test_stop_fails_queued_never_admitted_requests(small):
    """stop() contract, queued-but-not-admitted: a request sitting in the
    queue (scheduler never started) is failed with "engine stopped" instead
    of stranding its submitter until the request timeout."""
    cfg, params = small
    eng = _engine(cfg, params)  # NOT started: the request stays queued
    errs = {}

    def queued_req():
        try:
            eng.submit([1, 5, 9], max_new_tokens=8, timeout=60)
        except Exception as e:
            errs["e"] = e

    t = threading.Thread(target=queued_req)
    t.start()
    # wait until the request is actually enqueued (submit runs host-side
    # validation first); queue size is host state, no device involved
    for _ in range(500):
        if not eng._queue.empty():
            break
        time.sleep(0.01)
    eng.stop()
    t.join(timeout=30)
    assert "e" in errs and "stopped" in str(errs["e"])
    assert not bool(np.asarray(eng.state["active"]).any())
    # post-stop submits are rejected immediately
    with pytest.raises(RuntimeError, match="stopped"):
        eng.submit([1, 2], max_new_tokens=2)


def test_stop_racing_admission_deactivates_inserted_lane(small):
    """stop() contract, mid-admission race: stop() lands AFTER the scheduler
    popped the request from the queue and dispatched its insert (lane
    active=True on device) but BEFORE registration in _by_slot. The
    registration check must fail the request AND deactivate the lane its
    insert just activated — stop()'s own sweep saw an empty _by_slot and
    cannot cover it. This is the deterministic reproduction of the r4 flake.
    """
    cfg, params = small
    eng = _engine(cfg, params)
    entered, release = threading.Event(), threading.Event()
    orig_insert = eng.insert_fn

    def gated_insert(*a, **kw):
        entered.set()
        assert release.wait(60)
        return orig_insert(*a, **kw)

    eng.insert_fn = gated_insert
    eng.start()
    errs = {}

    def racing_req():
        try:
            eng.submit([1, 7, 11], max_new_tokens=8, timeout=60)
        except Exception as e:
            errs["e"] = e

    t = threading.Thread(target=racing_req)
    t.start()
    assert entered.wait(30)  # scheduler is inside _admit, pre-registration
    stopper = threading.Thread(target=eng.stop)
    stopper.start()
    # stop() sets _stopped under the submit lock first thing; once visible,
    # releasing the insert lets _admit reach the registration check with
    # _stopped already True — the exact interleaving of the flake
    for _ in range(3000):
        if eng._stopped:
            break
        time.sleep(0.001)
    assert eng._stopped
    release.set()
    stopper.join(timeout=60)
    t.join(timeout=30)
    assert "e" in errs and "stopped" in str(errs["e"])
    assert not bool(np.asarray(eng.state["active"]).any())
    # the lane leaked into neither registry nor the free-list's complement
    assert not eng._by_slot
    assert sorted(eng._free) == list(range(eng.ecfg.slots))


def test_engine_warmup_executes_and_guards(small):
    """warmup() executes each program (jit.lower().compile() alone does not
    seed the dispatch cache), leaves the idle state harmless, and refuses
    to run while the scheduler is live."""
    cfg, params = small
    eng = _engine(cfg, params)
    eng.warmup(embeds=True)
    # programs are genuinely in the dispatch cache now
    assert eng.decode_chunk_fn._cache_size() >= 1
    assert eng.prefill_fn._cache_size() >= 1
    assert eng.prefill_fn.embeds._cache_size() >= 1
    # warmup covers the argument structures serving actually uses: _admit
    # always passes a halt array (and the host stop path dispatches
    # _deactivate), so neither may recompile on the scheduler thread once
    # requests are live
    insert_compiles = eng.insert_fn._cache_size()
    deact_compiles = eng._deactivate._cache_size()
    assert deact_compiles >= 1
    eng.start()
    try:
        with pytest.raises(RuntimeError, match="before start"):
            eng.warmup()
        # the warmup's scratch insert (lane 0, budget 0) must not disturb
        # real serving — parity still holds on every lane
        prompt = [1, 17, 23, 42]
        assert eng.submit(prompt, max_new_tokens=8) == _ref_tokens(cfg, params, prompt, 8)
        assert eng.submit(prompt, max_new_tokens=8) == _ref_tokens(cfg, params, prompt, 8)
        assert eng.insert_fn._cache_size() == insert_compiles
        assert eng._deactivate._cache_size() == deact_compiles
    finally:
        eng.stop()
