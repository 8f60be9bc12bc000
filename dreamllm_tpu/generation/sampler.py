"""Autoregressive decoding with a static KV cache — greedy / temperature /
top-k / top-p.

TPU-native replacement for the reference's HF ``generate()`` integration
(modeling_dreamllm.py:1511-1549 prepare_inputs_for_generation/_reorder_cache
+ transformers' sampling loop). Design: one jitted prefill + one jitted
single-token step inside ``lax.while_loop`` — fixed shapes, zero per-step
recompiles or host syncs; stopping is a device-side predicate (EOS or
max_len), replacing KeywordsStoppingCriteria (vqa_inference.py:110-137).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from dreamllm_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    llama_forward,
    llama_logits,
)


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    max_new_tokens: int = 128
    temperature: float = 1.0
    top_k: int = 0          # 0 = off
    top_p: float = 1.0      # 1.0 = off
    greedy: bool = False
    eos_token_id: int = 2
    pad_token_id: int = 0
    # extra per-sample halt tokens (e.g. <dream_start> for interleaved
    # generation). Unlike EOS, the stop token itself IS stored in the output.
    stop_tokens: tuple[int, ...] = ()
    # single-token stop separators (conversation seps that tokenize to ONE
    # id): treated exactly like EOS — decoding halts and the token is NOT
    # stored. Device-side replacement for the reference's
    # KeywordsStoppingCriteria + trailing strip (vqa_inference.py:96-146);
    # multi-token separators go through generation/stopping.py host-side.
    halt_tokens: tuple[int, ...] = ()


def validate_sampling(temperature: float, top_k: int, top_p: float) -> None:
    """Reject sampling params that poison a row instead of failing loudly:
    ``top_p <= 0`` masks every logit to -inf (the output degenerates to
    token 0 forever), JSON-supplied NaN temperature poisons the logits.
    Serving paths call this on CLIENT-controlled values before they reach
    a compiled sampler (engine.submit, the /chat handler). Raises
    ``ClientError`` (a ValueError) so the HTTP layer maps it to 400."""
    import math

    from dreamllm_tpu.utils.errors import ClientError

    if not math.isfinite(temperature) or temperature < 0:
        raise ClientError(f"temperature must be finite and >= 0, got {temperature}")
    if math.isnan(top_p) or not (0.0 < top_p <= 1.0):
        raise ClientError(f"top_p must be in (0, 1], got {top_p}")
    if top_k < 0:
        raise ClientError(f"top_k must be >= 0, got {top_k}")


def sample_token(logits: jnp.ndarray, rng: jax.Array, cfg: SamplingConfig) -> jnp.ndarray:
    """Sample next token ids from [B, V] logits."""
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -cfg.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep smallest set with cumulative prob >= top_p (always keep top-1).
        # Cut entries map to +inf so the min() lands on the smallest KEPT
        # logit (-inf made the cutoff -inf and filtered nothing)
        cutoff_mask = cum - probs >= cfg.top_p
        cutoff = jnp.where(cutoff_mask, jnp.inf, sorted_logits).min(axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def sample_token_per_row(
    logits: jnp.ndarray,       # [B, V]
    rng: jax.Array,
    greedy: jnp.ndarray,       # [B] bool
    temperature: jnp.ndarray,  # [B] f32
    top_k: jnp.ndarray,        # [B] i32 (0 = off)
    top_p: jnp.ndarray,        # [B] f32 (1.0 = off)
    row_rngs: jax.Array | None = None,   # [B] keys — per-row sampling streams
) -> jnp.ndarray:
    """``sample_token`` with PER-ROW sampling parameters — each row applies
    its own greedy/temperature/top-k/top-p. This is what lets the
    continuous-batching engine serve requests with different sampling
    settings in ONE compiled decode (vLLM-class per-request params; the
    reference's serve path fixes one setting per process). Row semantics
    match the scalar path exactly: a row with greedy=True returns its
    argmax; top-k cuts below the k-th largest (ties kept), then top-p keeps
    the smallest prefix of the (post-top-k) sorted distribution reaching
    ``top_p`` (always at least top-1).

    The full path sorts [B, V] logits (top-k threshold + top-p cumsum);
    a ``lax.cond`` skips ALL of it at runtime when every row is greedy, so
    pure-greedy serving keeps the plain-argmax decode cost."""
    _, v = logits.shape
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _sampled():
        l = logits / jnp.maximum(temperature, 1e-6)[:, None]
        sorted_l = jnp.sort(l, axis=-1)[:, ::-1]  # descending
        k = jnp.clip(top_k, 0, v)
        k_on = (k > 0)[:, None]
        kth = jnp.take_along_axis(sorted_l, jnp.maximum(k - 1, 0)[:, None], axis=-1)
        lk = jnp.where(k_on & (l < kth), -jnp.inf, l)
        # top-p over the post-top-k sorted values. Mask by VALUE (< kth),
        # exactly like the unsorted cut above — masking by position (>= k)
        # would drop entries TIED with the k-th largest from the top-p mass
        # while lk keeps them, shrinking the cumsum support and cutting
        # tokens the scalar sample_token path keeps.
        sorted_k = jnp.where(k_on & (sorted_l < kth), -jnp.inf, sorted_l)
        probs = jax.nn.softmax(sorted_k, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_mask = cum - probs >= top_p[:, None]
        cutoff = jnp.where(cutoff_mask, jnp.inf, sorted_k).min(axis=-1, keepdims=True)
        lk = jnp.where((top_p < 1.0)[:, None] & (lk < cutoff), -jnp.inf, lk)
        if row_rngs is not None:
            # per-row keys: each lane samples from its OWN stream (the
            # engine derives them from (request seed, sample index), making
            # a request's sampled output reproducible regardless of which
            # slot it landed in or what else was decoding)
            sampled = jax.vmap(
                lambda k, row: jax.random.categorical(k, row)
            )(row_rngs, lk).astype(jnp.int32)
        else:
            sampled = jax.random.categorical(rng, lk, axis=-1).astype(jnp.int32)
        return jnp.where(greedy, greedy_tok, sampled)

    return jax.lax.cond(jnp.all(greedy), lambda: greedy_tok, _sampled)


def generate_text(
    params,
    llm_cfg: LlamaConfig,
    input_ids: jnp.ndarray,          # [B, S] right-padded with pad_token_id
    prompt_lengths: jnp.ndarray,     # [B] true prompt lengths
    cfg: SamplingConfig,
    rng: jax.Array | None = None,
    *,
    inputs_embeds: jnp.ndarray | None = None,  # optional spliced embeds [B,S,H]
    cache_dtype=jnp.bfloat16,
) -> dict:
    """Batched decode. Returns dict with ``tokens`` [B, max_new_tokens]
    (pad-filled after EOS), ``lengths`` [B], and the final ``kv_cache``.

    The prompt may be padded; ``segment_ids`` derive from prompt_lengths so
    pad slots never participate in attention. All shapes static.
    """
    b, s = input_ids.shape
    max_len = s + cfg.max_new_tokens
    if rng is None:
        rng = jax.random.PRNGKey(0)

    pos = jnp.arange(s, dtype=jnp.int32)[None]
    seg = (pos < prompt_lengths[:, None]).astype(jnp.int32)
    positions = jnp.where(seg == 1, pos, 0)

    cache = init_kv_cache(llm_cfg, b, max_len, dtype=cache_dtype)
    out = llama_forward(
        params, llm_cfg,
        input_ids=None if inputs_embeds is not None else input_ids,
        inputs_embeds=inputs_embeds,
        segment_ids=seg, positions=positions, kv_cache=cache,
    )
    cache = out["kv_cache"]
    # logits at each sample's last real token
    last_idx = jnp.maximum(prompt_lengths - 1, 0)
    last_hidden = jnp.take_along_axis(
        out["last_hidden_state"], last_idx[:, None, None], axis=1
    )
    first_tok = sample_token(
        llama_logits(params, llm_cfg, last_hidden)[:, 0], rng, cfg
    )

    def step_fn(state):
        i, tok, toks, done, count, cache, rng = state
        rng, sub = jax.random.split(rng)
        # decode position = prompt_len + i per sample
        positions = (prompt_lengths + i)[:, None].astype(jnp.int32)
        out = llama_forward(
            params, llm_cfg,
            input_ids=tok[:, None],
            segment_ids=jnp.ones((b, 1), jnp.int32),
            positions=positions,
            kv_cache=cache,
        )
        logits = llama_logits(params, llm_cfg, out["last_hidden_state"])[:, 0]
        nxt = sample_token(logits, sub, cfg)
        hit_stop = jnp.zeros_like(done)
        for t in cfg.stop_tokens:
            hit_stop = hit_stop | (tok == t)
        is_halt = jnp.zeros_like(done)
        for t in cfg.halt_tokens:
            is_halt = is_halt | (tok == t)
        done_now = done | (tok == cfg.eos_token_id) | is_halt
        store = jnp.where(done_now, cfg.pad_token_id, tok)
        toks = jax.lax.dynamic_update_slice(toks, store[:, None], (0, i))
        # exact per-row emit count: a genuinely generated pad-id token
        # (<unk> is id 0 in LLaMA vocabs) must still count — counting
        # non-pad cells after the fact would under-report it
        count = count + (~done_now).astype(jnp.int32)
        done_now = done_now | hit_stop  # stop token is stored, then halts
        return (i + 1, jnp.where(done_now, cfg.eos_token_id, nxt), toks,
                done_now, count, out["kv_cache"], rng)

    def cond_fn(state):
        i, _, _, done, _, _, _ = state
        return (i < cfg.max_new_tokens) & ~jnp.all(done)

    toks0 = jnp.full((b, cfg.max_new_tokens), cfg.pad_token_id, jnp.int32)
    done0 = jnp.zeros((b,), bool)
    count0 = jnp.zeros((b,), jnp.int32)
    steps, _, toks, done, lengths, cache, _ = jax.lax.while_loop(
        cond_fn, step_fn, (jnp.int32(0), first_tok, toks0, done0, count0, cache, rng)
    )
    # NOTE: rows that halt early keep being fed EOS while other rows decode;
    # their trailing cache slots are junk. Resuming decode from the returned
    # cache (interleaved generation) is only meaningful for batch size 1.
    return {"tokens": toks, "lengths": lengths, "kv_cache": cache, "steps": steps}


@partial(jax.jit, static_argnames=("llm_cfg", "cfg"))
def generate_text_jit(params, llm_cfg, input_ids, prompt_lengths, cfg, rng):
    return generate_text(params, llm_cfg, input_ids, prompt_lengths, cfg, rng)


def beam_search(
    params,
    llm_cfg: LlamaConfig,
    input_ids: jnp.ndarray,          # [B, S] right-padded
    prompt_lengths: jnp.ndarray,     # [B]
    *,
    num_beams: int = 4,
    max_new_tokens: int = 32,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    halt_tokens: tuple[int, ...] = (),
    length_penalty: float = 1.0,
    inputs_embeds: jnp.ndarray | None = None,
    cache_dtype=jnp.bfloat16,
) -> dict:
    """Batched beam search with a static KV cache.

    The reference gets beams from HF ``generate(num_beams=...)`` with
    ``_reorder_cache`` shuffling past_key_values per step
    (modeling_dreamllm.py:1549); here the cache lives as ``[L, B·K, S, ...]``
    and reordering is one gather on the beam axis inside the loop — fixed
    shapes, fully on device.

    Returns {"tokens": [B, max_new_tokens], "scores": [B]} for the best beam.
    """
    b, s = input_ids.shape
    k = num_beams
    max_len = s + max_new_tokens
    NEG = jnp.float32(-1e9)

    pos = jnp.arange(s, dtype=jnp.int32)[None]
    seg = (pos < prompt_lengths[:, None]).astype(jnp.int32)
    positions = jnp.where(seg == 1, pos, 0)

    # ---- prefill once per sample, then tile the cache per beam ----
    cache = init_kv_cache(llm_cfg, b, max_len, dtype=cache_dtype)
    out = llama_forward(
        params, llm_cfg,
        input_ids=None if inputs_embeds is not None else input_ids,
        inputs_embeds=inputs_embeds,
        segment_ids=seg, positions=positions, kv_cache=cache,
    )
    cache = out["kv_cache"]
    last_idx = jnp.maximum(prompt_lengths - 1, 0)
    last_hidden = jnp.take_along_axis(out["last_hidden_state"], last_idx[:, None, None], axis=1)
    logp0 = jax.nn.log_softmax(
        llama_logits(params, llm_cfg, last_hidden)[:, 0].astype(jnp.float32), axis=-1
    )  # [B, V]

    cache = {
        "k": jnp.repeat(cache["k"], k, axis=1),
        "v": jnp.repeat(cache["v"], k, axis=1),
        **{n: jnp.repeat(cache[n], k, axis=1)
           for n in ("k_scale", "v_scale") if n in cache},
        "seg": jnp.repeat(cache["seg"], k, axis=0),
        "pos": jnp.repeat(cache["pos"], k, axis=0),
        "index": cache["index"],
    }
    beam_lens = jnp.repeat(prompt_lengths, k, axis=0)  # [B*K]

    # initial beams: top-k first tokens per sample
    top_lp, top_tok = jax.lax.top_k(logp0, k)           # [B, K]
    scores = top_lp.reshape(b * k)                      # [B*K]
    cur_tok = top_tok.reshape(b * k).astype(jnp.int32)
    toks0 = jnp.full((b * k, max_new_tokens), pad_token_id, jnp.int32)
    toks0 = toks0.at[:, 0].set(cur_tok)
    def _beam_halt(t):
        hit = t == eos_token_id
        for st in halt_tokens:
            hit = hit | (t == st)
        return hit

    done0 = _beam_halt(cur_tok)
    V = llm_cfg.vocab_size

    def step(state):
        i, toks, scores, done, cache, cur_tok = state
        positions = (beam_lens + i)[:, None].astype(jnp.int32)
        o = llama_forward(
            params, llm_cfg, input_ids=cur_tok[:, None],
            segment_ids=jnp.ones((b * k, 1), jnp.int32),
            positions=positions, kv_cache=cache,
        )
        lp = jax.nn.log_softmax(
            llama_logits(params, llm_cfg, o["last_hidden_state"])[:, 0].astype(jnp.float32),
            axis=-1,
        )  # [B*K, V]
        # finished beams only extend with PAD at no cost; LIVE beams may not
        # choose PAD (it is the padding sentinel, not a real continuation)
        lp = jnp.where(done[:, None], NEG, lp)
        lp = lp.at[:, pad_token_id].set(jnp.where(done, 0.0, NEG))

        cand = scores[:, None] + lp                      # [B*K, V]
        cand = cand.reshape(b, k * V)
        new_scores, flat_idx = jax.lax.top_k(cand, k)    # [B, K]
        src_beam = flat_idx // V                          # [B, K] in 0..K-1
        new_tok = (flat_idx % V).astype(jnp.int32)

        # gather/reorder beams
        gather_rows = (jnp.arange(b)[:, None] * k + src_beam).reshape(b * k)
        new_cache = {
            "k": o["kv_cache"]["k"][:, gather_rows],
            "v": o["kv_cache"]["v"][:, gather_rows],
            **{n: o["kv_cache"][n][:, gather_rows]
               for n in ("k_scale", "v_scale") if n in o["kv_cache"]},
            "seg": o["kv_cache"]["seg"][gather_rows],
            "pos": o["kv_cache"]["pos"][gather_rows],
            "index": o["kv_cache"]["index"],
        }
        toks = toks[gather_rows]
        done = done[gather_rows]
        scores = new_scores.reshape(b * k)
        cur = new_tok.reshape(b * k)
        toks = toks.at[:, i + 1].set(jnp.where(done, pad_token_id, cur))
        done = done | _beam_halt(cur)
        return i + 1, toks, scores, done, new_cache, jnp.where(done, pad_token_id, cur)

    def cond(state):
        i, _, _, done, _, _ = state
        return (i < max_new_tokens - 1) & ~jnp.all(done)

    i, toks, scores, done, cache, _ = jax.lax.while_loop(
        cond, step, (jnp.int32(0), toks0, scores, done0, cache, cur_tok)
    )
    # length-penalized best beam per sample (HF convention: score / len^alpha)
    lengths = jnp.sum((toks != pad_token_id) & (toks != eos_token_id), axis=-1)
    norm = scores / jnp.maximum(lengths.astype(jnp.float32), 1.0) ** length_penalty
    norm = norm.reshape(b, k)
    best = jnp.argmax(norm, axis=-1)
    toks = toks.reshape(b, k, max_new_tokens)[jnp.arange(b), best]
    # strip eos / halt separators (each appears only as a beam's final
    # stored token — decoding stops there)
    toks = jnp.where(_beam_halt(toks), pad_token_id, toks)
    return {"tokens": toks, "scores": norm[jnp.arange(b), best]}


def generate_text_speculative(
    params,
    llm_cfg: LlamaConfig,
    input_ids: jnp.ndarray,          # [1, S] right-padded
    prompt_lengths: jnp.ndarray,     # [1]
    cfg: SamplingConfig,
    *,
    draft_len: int = 8,
    inputs_embeds: jnp.ndarray | None = None,
    cache_dtype=jnp.bfloat16,
) -> dict:
    """Prompt-lookup speculative greedy decode (batch 1).

    Beyond-parity serving feature: b1 decode is HBM-bandwidth-bound on the
    weight read, so verifying ``draft_len`` drafted tokens in ONE forward
    costs the same wall clock as decoding one token — every accepted draft is
    nearly free. Drafts come from the sequence itself (latest bigram match in
    prompt+generated, "prompt lookup decoding"): no draft model, exactness
    preserved — the output equals greedy :func:`generate_text` token-for-token.

    Each iteration feeds ``[cur, d_1..d_K]`` against the KV cache, takes
    greedy argmax g_0..g_K, accepts the longest prefix with d_i == g_{i-1},
    emits ``a+1`` tokens (a matches + 1 free correction), and REWINDS the
    cache write index to ``idx + a + 1`` — rejected slots are overwritten by
    the next window, and positional masking (pos/seg metadata) keeps them
    invisible meanwhile.

    Near the token budget, draft positions can exceed
    ``max_position_embeddings`` by up to ``draft_len``: such drafts are
    budget-rejected (never emitted) and their cache slots overwritten, and
    the RoPE table gather clips, so correctness is unaffected — but size
    ``max_position_embeddings >= prompt + max_new_tokens + draft_len`` to
    keep every verify window's rope exact.
    """
    assert cfg.greedy, "speculative decoding preserves exactness only for greedy"
    b, s = input_ids.shape
    assert b == 1, "prompt-lookup speculation is a batch-1 latency feature"
    K = draft_len
    max_new = cfg.max_new_tokens
    # dense worst case: every iteration writes K+1 slots but advances 1
    max_len = s + max_new + K + 1

    pos = jnp.arange(s, dtype=jnp.int32)[None]
    seg = (pos < prompt_lengths[:, None]).astype(jnp.int32)
    positions = jnp.where(seg == 1, pos, 0)

    cache = init_kv_cache(llm_cfg, b, max_len, dtype=cache_dtype)
    out = llama_forward(
        params, llm_cfg,
        input_ids=None if inputs_embeds is not None else input_ids,
        inputs_embeds=inputs_embeds,
        segment_ids=seg, positions=positions, kv_cache=cache,
    )
    cache = out["kv_cache"]
    last_idx = jnp.maximum(prompt_lengths - 1, 0)
    last_hidden = jnp.take_along_axis(out["last_hidden_state"], last_idx[:, None, None], axis=1)
    first_tok = jnp.argmax(llama_logits(params, llm_cfg, last_hidden)[:, 0], axis=-1).astype(jnp.int32)

    L = s + max_new + K + 2  # slack: the last window write must not clamp
    # working sequence: prompt + generated (draft source)
    buf0 = jnp.zeros((L,), jnp.int32)
    buf0 = jax.lax.dynamic_update_slice(buf0, input_ids[0], (0,))
    plen = prompt_lengths[0]
    buf0 = jax.lax.dynamic_update_slice(buf0, first_tok, (plen,))

    def _is_stop(t):
        """stop_tokens (interleaved <dream_start> mode): stored, then halt."""
        hit = jnp.zeros(t.shape, bool)
        for st in cfg.stop_tokens:
            hit = hit | (t == st)
        return hit

    def _is_halt(t):
        """halt_tokens (single-token stop separators): NOT stored, halts."""
        hit = t == cfg.eos_token_id
        for st in cfg.halt_tokens:
            hit = hit | (t == st)
        return hit

    toks0 = jnp.full((max_new + K + 1,), cfg.pad_token_id, jnp.int32)
    first_eos = _is_halt(first_tok)[0]
    # EOS as the very first token is never stored (generate_text parity);
    # a stop token IS stored and then halts
    toks0 = toks0.at[0].set(jnp.where(first_eos, cfg.pad_token_id, first_tok[0]))
    done0 = first_eos | _is_stop(first_tok)[0]
    arangeL = jnp.arange(L - 1, dtype=jnp.int32)

    def lookup_draft(buf, cur_len):
        """Latest bigram match in buf[:cur_len] -> next K tokens."""
        x = buf[jnp.maximum(cur_len - 2, 0)]
        y = buf[jnp.maximum(cur_len - 1, 0)]
        m = (buf[:-1] == x) & (jnp.roll(buf, -1)[:-1] == y) & (arangeL < cur_len - 2)
        j = jnp.max(jnp.where(m, arangeL, -1))
        start = jnp.clip(j + 2, 0, L - K)
        draft = jax.lax.dynamic_slice(buf, (start,), (K,))
        # no match -> draft stays, acceptance simply fails (a == 0)
        return jnp.where(j >= 0, draft, jnp.full((K,), cfg.pad_token_id, jnp.int32))

    def step_fn(state):
        cnt, cur, buf, toks, done, cache, accepted_total, iters = state
        cur_len = plen + cnt                       # tokens in buf
        draft = lookup_draft(buf, cur_len)
        window = jnp.concatenate([cur, draft])[None]            # [1, K+1]
        positions = (cur_len - 1 + jnp.arange(K + 1, dtype=jnp.int32))[None]
        out = llama_forward(
            params, llm_cfg, input_ids=window,
            segment_ids=jnp.ones((1, K + 1), jnp.int32),
            positions=positions, kv_cache=cache,
        )
        g = jnp.argmax(
            llama_logits(params, llm_cfg, out["last_hidden_state"])[0], axis=-1
        ).astype(jnp.int32)                                      # [K+1]
        match = draft == g[:-1]                                  # [K]
        a = jnp.argmin(jnp.concatenate([match, jnp.zeros((1,), bool)]))  # first False
        emitted = g                                              # g[0..a] are real
        valid = jnp.arange(K + 1) <= a
        # EOS/halt truncation: emit nothing at/after the first EOS or halt
        # separator (exclusive); a stop token is emitted and THEN halts
        # (inclusive)
        is_eos = _is_halt(emitted) & valid
        eos_at = jnp.argmax(jnp.concatenate([is_eos, jnp.ones((1,), bool)]))
        is_stop = _is_stop(emitted) & valid
        stop_at = jnp.argmax(jnp.concatenate([is_stop, jnp.ones((1,), bool)]))
        n_emit = jnp.minimum(jnp.minimum(a + 1, eos_at), stop_at + 1).astype(jnp.int32)
        # never exceed the requested budget
        n_emit = jnp.minimum(n_emit, max_new - cnt)
        hit_eos = jnp.any(is_eos) | jnp.any(is_stop) | (n_emit < a + 1)

        store = jnp.where(jnp.arange(K + 1) < n_emit, emitted, cfg.pad_token_id)
        toks = jax.lax.dynamic_update_slice(toks, store, (cnt,))
        buf = jax.lax.dynamic_update_slice(buf, store, (cur_len,))
        # rewind the cache write index: only cur + a accepted drafts stay
        new_cache = dict(out["kv_cache"])
        new_cache["index"] = cache["index"] + a + 1
        # the next 'cur' is the LAST emitted token
        cur_new = jnp.where(n_emit > 0, emitted[jnp.maximum(n_emit - 1, 0)], cur[0])[None]
        return (cnt + n_emit, cur_new, buf, toks,
                done | hit_eos | (n_emit == 0), new_cache,
                accepted_total + a, iters + 1)

    def cond_fn(state):
        cnt, _, _, _, done, _, _, _ = state
        return (cnt < max_new) & ~done

    state = (jnp.int32(1), first_tok, buf0, toks0, done0, cache,
             jnp.int32(0), jnp.int32(0))
    cnt, _, _, toks, done, cache, accepted, iters = jax.lax.while_loop(
        cond_fn, step_fn, state
    )
    toks = toks[:max_new][None]
    # cnt is the exact emit count (same contract as generate_text): counting
    # non-pad cells would drop a genuinely generated pad-id token (<unk>=0).
    # first-token-EOS is the one case where cnt (a buffer cursor) overcounts:
    # nothing was stored
    lengths = jnp.where(first_eos, 0, jnp.minimum(cnt, max_new))[None]
    return {"tokens": toks, "lengths": lengths, "kv_cache": cache,
            "steps": iters, "accepted": accepted, "emitted": cnt}
