"""Continuous-batching decode engine (Orca/vLLM-class scheduling, TPU-static).

Beyond-parity serving: the reference serves one request at a time
(omni/eval/language_eval tools/serve.py), and this repo's DynamicBatcher
(serve/batching.py) batches requests that ARRIVE together — but a request
arriving mid-decode still waits for the whole previous batch. This engine
admits requests into per-slot KV-cache lanes *while other slots keep
decoding*, the standard continuous-batching design — built TPU-first:

  * ALL shapes static: ``slots`` cache lanes of ``max_len``; prompts prefill
    as a host loop of ``prefill_len``-token compiled appends (chunked
    prefill — any prompt length up to the lane, one compiled shape). Three
    compiled programs total (prefill chunk / insert / decode chunk) — zero
    shape-driven recompiles, ever.
  * per-slot cache write offsets (``cache_write`` vector-index path in
    models/llama.py): each lane fills at its own rate.
  * decode runs in compiled CHUNKS of ``chunk_steps`` tokens (a ``lax.scan``),
    amortizing host dispatch ~chunk×; admission happens at chunk boundaries,
    so admission latency is bounded by ``chunk_steps`` decode steps.
  * a freed lane is recycled by overwriting its seg/pos metadata at insert;
    stale K/V need no zeroing (positional masking keeps them invisible).

Greedy output is token-identical to ``generate_text`` (tests/test_engine.py).
"""

from __future__ import annotations

import dataclasses
import itertools
import queue
import threading
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.generation.sampler import (
    SamplingConfig,
    sample_token_per_row,
)
from dreamllm_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    llama_forward,
    llama_logits,
)
from dreamllm_tpu.utils.logging import get_logger

logger = get_logger("dreamllm_tpu.serve.engine")


def _stream_key(seed, idx):
    """Key for sample ``idx`` of a request's sampling stream. Derived from
    (request seed, sample index) only — NOT from engine state — so a
    request's sampled output is reproducible regardless of slot placement,
    admission order, or co-tenant lanes. Called inside jit (building the
    base key eagerly at import would initialize a backend)."""
    base = jax.random.PRNGKey(0x5EED)
    return jax.random.fold_in(jax.random.fold_in(base, seed), idx)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    slots: int = 8              # concurrent cache lanes
    prefill_len: int = 512     # tokens per compiled PREFILL CHUNK: prompts
    # prefill in P-token chunks up to max_len-1 (chunked prefill); only
    # max_len governs truncation
    max_len: int = 1024        # per-lane KV capacity (prompt + generated)
    chunk_steps: int = 8       # decode steps per compiled dispatch
    cache_dtype: str = "bfloat16"   # or "int8" (halved KV HBM)
    bos_token_id: int | None = 1    # kept at position 0 when left-truncating
    # Per-slot speculative decoding (0 = off): each decode step drafts
    # ``speculative_k`` tokens by prompt lookup (latest 2-gram match in the
    # lane's token history) and verifies them in ONE forward of 1+k query
    # tokens. Verification is EXACT-MATCH against the true sampling stream
    # (token i is sampled from the true logits with the request's
    # (seed, index) key and accepted only if the draft equals it), so
    # outputs are token-identical to the non-speculative engine for greedy
    # AND sampled requests — speculation only changes speed. b1 decode is
    # HBM-bound, so a verify step costs ~one decode step of weight reads;
    # accepted drafts are pure extra tokens per step.
    speculative_k: int = 0
    # Adaptive speculation (only meaningful with speculative_k > 0): the
    # scheduler keeps BOTH compiled chunk programs and picks per chunk from
    # measured tokens/sec EMAs per (mode, active-lane count) — an
    # epsilon-greedy bandit. Speculation wins at sparse occupancy (verify
    # rides the weight-read bandwidth) and loses when the batch is
    # compute-dense (BENCH r3: 399 vs 428 tok/s at 8 busy lanes); this
    # decides instead of making the operator guess. False = always draft.
    speculative_adaptive: bool = True
    # per-lane capacity for single-token stop separators (conversation
    # seps that tokenize to ONE id — generation/stopping.py). Each request
    # may pass up to this many stop_token_ids; they halt the lane
    # device-side WITHOUT being emitted (EOS semantics), mirroring the
    # reference's KeywordsStoppingCriteria + strip (vqa_inference.py:96-146).
    max_stop_tokens: int = 4
    # LRU prompt-prefix KV cache (0 = off). Requests sharing a token-exact
    # prefix of >= prefill_len tokens (a chat system prompt, few-shot
    # header) skip the prefill compute for the cached full chunks — only
    # the final (possibly partial) chunk runs. Each entry stores one
    # lane-size KV copy in HBM (7B bf16 @ max_len 1024 ≈ 0.5 GB/entry), so
    # size this to the number of distinct system prompts, not request rate.
    prefix_cache_entries: int = 0


# ---------------------------------------------------------------------------
# Compiled programs (pure functions of state)
# ---------------------------------------------------------------------------


def init_engine_state(llm_cfg: LlamaConfig, ecfg: EngineConfig, rng=None) -> dict:
    dtype = jnp.int8 if ecfg.cache_dtype == "int8" else jnp.bfloat16
    cache = init_kv_cache(llm_cfg, ecfg.slots, ecfg.max_len, dtype=dtype)
    cache["index"] = jnp.zeros((ecfg.slots,), jnp.int32)  # per-lane offsets
    extra = {}
    if ecfg.speculative_k:
        # per-lane token history aligned with cache positions (prompt ids
        # written at insert, decoded tokens as they are stored) — the
        # prompt-lookup draft source
        extra["history"] = jnp.zeros((ecfg.slots, ecfg.max_len), jnp.int32)
    return {
        **extra,
        "cache": cache,
        "cur_tok": jnp.zeros((ecfg.slots,), jnp.int32),
        "active": jnp.zeros((ecfg.slots,), bool),
        # per-slot single-token stop set (-1 = empty slot; never a token id)
        "halt": jnp.full((ecfg.slots, ecfg.max_stop_tokens), -1, jnp.int32),
        "emitted": jnp.zeros((ecfg.slots,), jnp.int32),
        "budget": jnp.zeros((ecfg.slots,), jnp.int32),
        # per-slot sampling params (vLLM-class per-request sampling in one
        # compiled decode); placeholders — insert_fn sets the real values
        "greedy": jnp.ones((ecfg.slots,), bool),
        "temperature": jnp.ones((ecfg.slots,), jnp.float32),
        "top_k": jnp.zeros((ecfg.slots,), jnp.int32),
        "top_p": jnp.ones((ecfg.slots,), jnp.float32),
        # per-slot sampling-stream seed: row keys derive from
        # (seed, sample index), so a request's sampled output is
        # reproducible regardless of slot placement or co-tenants
        "seed": jnp.zeros((ecfg.slots,), jnp.uint32),
        "rng": rng if rng is not None else jax.random.PRNGKey(0),
    }


def make_engine_fns(llm_cfg: LlamaConfig, scfg: SamplingConfig, ecfg: EngineConfig):
    """Build (prefill_fn, insert_fn, decode_chunk_fn), each one jitted program."""
    P, S, B, K = ecfg.prefill_len, ecfg.max_len, ecfg.slots, ecfg.chunk_steps
    if S % P != 0:
        # the final prefill chunk always writes a FULL P-row slice at its
        # start offset; with S % P != 0 a near-full lane's last chunk would
        # clamp its dynamic_update_slice start and overwrite earlier rows
        raise ValueError(
            f"max_len ({S}) must be a multiple of prefill_len ({P})"
        )
    dtype = jnp.int8 if ecfg.cache_dtype == "int8" else jnp.bfloat16

    def empty_prefill_cache():
        # lane-sized (S) so k/v rows copy straight into the engine lane
        return init_kv_cache(llm_cfg, 1, S, dtype=dtype)

    def _prefill_body(params, cache, clen, start, rng, samp, **inp):
        """Append ONE P-token chunk (right-padded, ``clen`` real) to a
        prefill cache at absolute offset ``start``. Prompts longer than P
        prefill as a host loop of these — every non-final chunk is full, so
        the scalar write index stays exact; the final chunk's pad slots write
        seg 0 (masked) and the lane insert rewrites metadata anyway.

        Returns (cache, first_token) — the token only meaningful on the
        final chunk.
        """
        pos = jnp.arange(P, dtype=jnp.int32)[None] + start
        seg = (jnp.arange(P, dtype=jnp.int32)[None] < clen[:, None]).astype(jnp.int32)
        cache = dict(cache, index=jnp.asarray(start, jnp.int32))
        out = llama_forward(
            params, llm_cfg,
            segment_ids=seg, positions=jnp.where(seg == 1, pos, 0),
            kv_cache=cache, **inp,
        )
        last = jnp.take_along_axis(
            out["last_hidden_state"], jnp.maximum(clen - 1, 0)[:, None, None], axis=1
        )
        logits = llama_logits(params, llm_cfg, last)[:, 0]
        # sample index 0 of this request's stream (decode continues at 1)
        first_key = _stream_key(samp["seed"], jnp.uint32(0))
        first = sample_token_per_row(
            logits, rng, samp["greedy"][None], samp["temperature"][None],
            samp["top_k"][None], samp["top_p"][None],
            row_rngs=first_key[None],
        )
        return out["kv_cache"], first[0]

    @partial(jax.jit, donate_argnums=(1,))
    def prefill_chunk_fn(params, cache, ids, clen, start, rng, samp):
        return _prefill_body(params, cache, clen, start, rng, samp,
                             input_ids=ids)

    @partial(jax.jit, donate_argnums=(1,))
    def prefill_embeds_chunk_fn(params, cache, embeds, clen, start, rng, samp):
        """Embeds-prompt twin of ``prefill_chunk_fn`` — serves multimodal
        prompts (CLIP features / dream queries spliced upstream by
        ``multimodal_embed``) through the same engine lanes. Decode after
        the prompt is token-driven, so only prefill needs this variant."""
        return _prefill_body(params, cache, clen, start, rng, samp,
                             inputs_embeds=embeds.astype(llm_cfg.dtype))

    @partial(jax.jit, donate_argnums=(0,))
    def insert_fn(state, pre_cache, plen, slot, first_tok, budget, samp,
                  lane_ids=None, halt=None):
        """Claim lane ``slot``: copy the prefilled K/V + reset lane metadata
        (including the lane's per-request sampling params). ``lane_ids``
        ([max_len] int32, prompt ids zero-padded) seeds the speculative
        token history when the engine runs with ``speculative_k``."""
        cache = dict(state["cache"])
        for name in ("k", "v", "k_scale", "v_scale"):
            if name in cache:
                cache[name] = jax.lax.dynamic_update_slice(
                    cache[name], pre_cache[name],
                    (0, slot) + (0,) * (cache[name].ndim - 2),
                )
        lane_pos = jnp.arange(S, dtype=jnp.int32)
        lane_seg = (lane_pos < plen).astype(jnp.int32)
        cache["seg"] = jax.lax.dynamic_update_slice(
            cache["seg"], lane_seg[None], (slot, 0)
        )
        cache["pos"] = jax.lax.dynamic_update_slice(
            cache["pos"], jnp.where(lane_seg == 1, lane_pos, 0)[None], (slot, 0)
        )
        cache["index"] = state["cache"]["index"].at[slot].set(plen)
        if halt is None:
            halt = jnp.full((ecfg.max_stop_tokens,), -1, jnp.int32)
        halt_tab = jax.lax.dynamic_update_slice(
            state["halt"], halt[None].astype(jnp.int32), (slot, 0)
        )
        eos_now = (first_tok == scfg.eos_token_id) | jnp.any(first_tok == halt)
        extra = {}
        if "history" in state:
            hist_row = (lane_ids if lane_ids is not None
                        else jnp.zeros((S,), jnp.int32))
            extra["history"] = jax.lax.dynamic_update_slice(
                state["history"], hist_row[None].astype(jnp.int32), (slot, 0)
            )
        return {
            **extra,
            "cache": cache,
            "cur_tok": state["cur_tok"].at[slot].set(first_tok),
            "halt": halt_tab,
            "active": state["active"].at[slot].set(~eos_now & (budget > 0)),
            "emitted": state["emitted"].at[slot].set(0),
            "budget": state["budget"].at[slot].set(budget),
            "greedy": state["greedy"].at[slot].set(samp["greedy"]),
            "temperature": state["temperature"].at[slot].set(samp["temperature"]),
            "top_k": state["top_k"].at[slot].set(samp["top_k"]),
            "top_p": state["top_p"].at[slot].set(samp["top_p"]),
            "seed": state["seed"].at[slot].set(samp["seed"]),
            "rng": state["rng"],
        }

    @partial(jax.jit, donate_argnums=(1,))
    def decode_chunk_fn(params, state):
        """K decode steps for all lanes -> (state, tokens [B, K] pad-filled).

        Mirrors generate_text's step semantics exactly: the carried token is
        STORED this step, the sampled token becomes the next carry — so
        greedy outputs are token-identical to the one-shot decoder.
        """

        def step(carry, _):
            if ecfg.speculative_k:
                cache, cur, active, emitted, budget, rng, hist = carry
            else:
                cache, cur, active, emitted, budget, rng = carry
                hist = None
            rng, sub = jax.random.split(rng)
            idx0 = cache["index"]
            out = llama_forward(
                params, llm_cfg,
                input_ids=cur[:, None],
                segment_ids=active[:, None].astype(jnp.int32),
                positions=idx0[:, None],
                kv_cache=cache,
            )
            cache = out["kv_cache"]
            # inactive lanes neither advance nor count (their seg write was 0)
            cache["index"] = jnp.where(active, idx0 + 1, idx0)
            logits = llama_logits(params, llm_cfg, out["last_hidden_state"])[:, 0]
            # per-slot sampling params are constant within a chunk (insert
            # happens only at chunk boundaries) — closed over, not carried.
            # Inactive lanes count as greedy: their sampled token is never
            # emitted (and the lane never reactivates), so a FINISHED
            # sampled request must not keep defeating the all-greedy
            # fast path (lane params are only rewritten at the next insert).
            emitted = emitted + active.astype(jnp.int32)
            # the token sampled now is sample index `emitted` of the lane's
            # stream (prefill sampled index 0) — keys from (seed, index)
            row_keys = jax.vmap(_stream_key)(
                state["seed"], emitted.astype(jnp.uint32)
            )
            nxt = sample_token_per_row(
                logits, sub, state["greedy"] | ~active, state["temperature"],
                state["top_k"], state["top_p"], row_rngs=row_keys,
            )
            emit = jnp.where(active, cur, scfg.pad_token_id)
            if hist is not None:
                # keep the speculative draft source aligned with cache
                # positions across mode switches: position idx0 holds the
                # token whose KV was written there this step
                hist = jnp.where(
                    active[:, None]
                    & (jnp.arange(S, dtype=jnp.int32)[None] == idx0[:, None]),
                    cur[:, None], hist,
                )
            hit_stop = jnp.zeros_like(active)
            for t in scfg.stop_tokens:
                hit_stop = hit_stop | (emit == t)
            valid = active  # a real token was emitted this step for the lane
            # per-slot stop separators: like EOS, nxt is never emitted
            hit_halt = jnp.any(nxt[:, None] == state["halt"], axis=1)
            active = (
                active
                & (nxt != scfg.eos_token_id)
                & ~hit_halt
                & ~hit_stop
                & (emitted < budget)
                & (cache["index"] < S)
            )
            nc = (cache, nxt, active, emitted, budget, rng)
            if hist is not None:
                nc = nc + (hist,)
            return nc, (emit, valid)

        carry = (state["cache"], state["cur_tok"], state["active"],
                 state["emitted"], state["budget"], state["rng"])
        if ecfg.speculative_k:
            carry = carry + (state["history"],)
        carry, (toks, valid) = jax.lax.scan(step, carry, None, length=K)
        cache, cur, active, emitted, budget, rng = carry[:6]
        extra_hist = {"history": carry[6]} if ecfg.speculative_k else {}
        new_state = {**extra_hist,
                     "cache": cache, "cur_tok": cur, "active": active,
                     "emitted": emitted, "budget": budget, "rng": rng,
                     "halt": state["halt"],
                     "greedy": state["greedy"],
                     "temperature": state["temperature"],
                     "top_k": state["top_k"], "top_p": state["top_p"],
                     "seed": state["seed"]}
        # per-step validity mask travels with the tokens: routing by mask
        # (not by == pad_token_id) keeps a genuinely generated pad-id token
        # (<unk> is id 0 in LLaMA vocabs) in the output stream.
        # `active` is ALSO returned as a dedicated int32 copy: the pipelined
        # scheduler holds chunk N's results while dispatching chunk N+1, and
        # new_state["active"] gets donated to that dispatch — reading it
        # afterwards would hit a deleted buffer. The int32 cast guarantees a
        # distinct, never-donated output buffer (a bool alias could share).
        return new_state, toks.T, valid.T, active.astype(jnp.int32)

    @partial(jax.jit, donate_argnums=(1,))
    def decode_spec_chunk_fn(params, state):
        """K speculative decode steps -> (state, tokens [B, K*(1+k)], valid,
        active). Each step drafts ``k = ecfg.speculative_k`` tokens by prompt
        lookup over the lane's token history and verifies them in ONE
        forward of 1+k query tokens per lane.

        Exactness: token at stream index i is ALWAYS sampled from the true
        model logits at its position with the request's (seed, i) key — a
        draft is accepted only when it EQUALS that sampled token, so the
        emitted stream is bit-identical to the non-speculative engine (and,
        for greedy, to generate_text), for any per-slot sampling params.
        Rolled-back KV rows (drafts past the accepted prefix) stay invisible:
        their cache ``pos`` exceeds every later query position until the next
        step overwrites them (positional masking, models/llama.py:384-392).
        """
        k = ecfg.speculative_k
        W = 1 + k  # verify window: carried token + k drafts

        def step(carry, _):
            cache, cur, active, emitted, budget, rng, hist = carry
            rng, sub = jax.random.split(rng)
            idx0 = cache["index"]  # [B] per-lane write offsets

            # ---- draft: latest 2-gram (prev, cur) match in the history ----
            prev = jnp.take_along_axis(
                hist, jnp.maximum(idx0 - 1, 0)[:, None], axis=1
            )[:, 0]
            pos_r = jnp.arange(S, dtype=jnp.int32)[None]  # [1, S]
            hist_prev = jnp.pad(hist[:, :-1], ((0, 0), (1, 0)))
            cand = (
                (hist == cur[:, None])
                & (hist_prev == prev[:, None])
                & (pos_r >= 1)
                & (pos_r < idx0[:, None] - 1)  # strictly before (prev, cur)
            )
            jstar = jnp.max(jnp.where(cand, pos_r, -1), axis=1)  # -1 = none
            base = jnp.where(jstar >= 0, jstar + 1, 0)
            gidx = jnp.clip(base[:, None] + jnp.arange(k)[None], 0, S - 1)
            # any draft value is CORRECT (acceptance is exact-match); a bad
            # draft only wastes the already-paid verify compute
            drafts = jnp.take_along_axis(hist, gidx, axis=1)  # [B, k]

            # ---- verify forward over [cur, d1..dk] ----
            qtok = jnp.concatenate([cur[:, None], drafts], axis=1)  # [B, W]
            seg = jnp.broadcast_to(
                active[:, None], (B, W)
            ).astype(jnp.int32)
            pos = idx0[:, None] + jnp.arange(W, dtype=jnp.int32)[None]
            out = llama_forward(
                params, llm_cfg,
                input_ids=qtok, segment_ids=seg, positions=pos,
                kv_cache=cache,
            )
            cache = out["kv_cache"]
            logits = llama_logits(params, llm_cfg, out["last_hidden_state"])

            # ---- true sampling stream at every verify position ----
            # invariant (same as the plain path): `cur` carries stream index
            # == `emitted`; position i here samples index emitted + 1 + i
            key_idx = (emitted[:, None] + 1 + jnp.arange(W)[None]).astype(
                jnp.uint32
            )
            row_keys = jax.vmap(jax.vmap(_stream_key))(
                jnp.broadcast_to(state["seed"][:, None], (B, W)), key_idx
            )
            rep = lambda a: jnp.repeat(a, W, axis=0)
            sampled = sample_token_per_row(
                logits.reshape(B * W, -1), sub,
                rep(state["greedy"] | ~active), rep(state["temperature"]),
                rep(state["top_k"]), rep(state["top_p"]),
                row_rngs=row_keys.reshape(B * W, -1),
            ).reshape(B, W)

            # ---- sequential accept/emit semantics, unrolled over W ----
            # `live` = lane active AND this sub-step is on the true path;
            # `lane_active` = the state the lane carries out (set by the
            # LAST reached sub-step's continuation checks, exactly the
            # plain path's active-update applied once per stored token)
            live = active
            lane_active = active
            emit_cnt = emitted
            emit_masks = []
            for j in range(W):
                emit_masks.append(live)
                emit_cnt = emit_cnt + live.astype(jnp.int32)
                cj = qtok[:, j]
                nxt_j = sampled[:, j]
                hit_stop = jnp.zeros_like(live)
                for t in scfg.stop_tokens:
                    hit_stop = hit_stop | (cj == t)
                cont = (
                    (nxt_j != scfg.eos_token_id)
                    & ~jnp.any(nxt_j[:, None] == state["halt"], axis=1)
                    & ~hit_stop
                    & (emit_cnt < budget)
                    & (idx0 + j + 1 < S)
                )
                lane_active = jnp.where(live, cont, lane_active)
                if j < k:
                    live = live & cont & (nxt_j == drafts[:, j])
            emit_valid = jnp.stack(emit_masks, axis=1)  # [B, W]
            adv = emit_cnt - emitted  # tokens stored this step
            # the carry = the sampled token at the last reached position
            nxt = jnp.take_along_axis(
                sampled, jnp.maximum(adv - 1, 0)[:, None], axis=1
            )[:, 0]
            cache["index"] = idx0 + adv  # inactive lanes: adv == 0
            # write ALL verify-window tokens (stale rows past the accepted
            # prefix are invisible to drafting — it masks j < idx-1 — and
            # get overwritten next step, same argument as the KV rollback);
            # out-of-capacity positions drop instead of clamp-colliding
            hist = hist.at[
                jnp.arange(B, dtype=jnp.int32)[:, None], pos
            ].set(qtok, mode="drop")
            return (
                (cache, nxt, lane_active, emit_cnt, budget, rng, hist),
                (qtok, emit_valid),
            )

        carry = (state["cache"], state["cur_tok"], state["active"],
                 state["emitted"], state["budget"], state["rng"],
                 state["history"])
        carry, (toks, valid) = jax.lax.scan(step, carry, None, length=K)
        cache, cur, active, emitted, budget, rng, hist = carry
        new_state = {"cache": cache, "cur_tok": cur, "active": active,
                     "emitted": emitted, "budget": budget, "rng": rng,
                     "history": hist,
                     "halt": state["halt"],
                     "greedy": state["greedy"],
                     "temperature": state["temperature"],
                     "top_k": state["top_k"], "top_p": state["top_p"],
                     "seed": state["seed"]}
        # [K, B, W] -> [B, K*W], chunk-ordered per lane
        toks_out = jnp.transpose(toks, (1, 0, 2)).reshape(B, K * (1 + k))
        valid_out = jnp.transpose(valid, (1, 0, 2)).reshape(B, K * (1 + k))
        return new_state, toks_out, valid_out, active.astype(jnp.int32)

    prefill_chunk_fn.empty_cache = empty_prefill_cache
    prefill_chunk_fn.embeds = prefill_embeds_chunk_fn
    if ecfg.speculative_k:
        if ecfg.speculative_adaptive:
            # both programs share the state pytree (incl. history) so the
            # scheduler can switch per chunk
            decode_spec_chunk_fn.plain = decode_chunk_fn
        return prefill_chunk_fn, insert_fn, decode_spec_chunk_fn
    return prefill_chunk_fn, insert_fn, decode_chunk_fn


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


class _Request:
    __slots__ = ("ids", "embeds", "max_new_tokens", "tokens", "done", "slot",
                 "stream", "error", "chunk_joined", "chunk_last", "samp",
                 "abandoned", "stop_ids", "stop_fn")

    def __init__(self, ids, max_new_tokens, stream=None, samp=None, embeds=None,
                 stop_ids=(), stop_fn=None):
        self.ids = ids
        self.embeds = embeds  # [S, H] prompt embeddings (multimodal prompts)
        self.abandoned = False  # submitter timed out; skip at admission
        self.stop_ids = tuple(stop_ids)  # single-token stops (device-side)
        # host-side stop predicate over accumulated ids (multi-token stop
        # strings); checked at chunk boundaries — see generation/stopping.py
        self.stop_fn = stop_fn
        self.max_new_tokens = max_new_tokens
        self.samp = samp  # per-request sampling params (host floats/ints)
        self.tokens: list[int] = []
        self.done = threading.Event()
        self.slot = -1
        self.stream = stream  # optional per-token callback
        self.error: Exception | None = None
        # index of the first decode chunk whose results include this request
        # (set at insert; results of EARLIER chunks on a recycled lane must
        # not be routed to it, nor may their stale active=False finish it)
        self.chunk_joined = -1
        # last chunk that can possibly emit for it (budget bound: at most
        # chunk_steps emissions per chunk) — after this chunk is dispatched
        # the lane is CERTAINLY inactive and may be retired/reused early
        self.chunk_last = -1


class ContinuousBatchingEngine:
    """Slot-scheduled decode: submit token prompts, receive generated ids.

    ``submit()`` is thread-safe and blocking (or pass ``stream`` for a
    per-token callback). The engine thread admits waiting requests into free
    lanes at every chunk boundary while busy lanes keep decoding.
    """

    def __init__(
        self,
        params,
        llm_cfg: LlamaConfig,
        scfg: SamplingConfig,
        ecfg: EngineConfig | None = None,
    ):
        self.params = params
        self.llm_cfg = llm_cfg
        self.scfg = scfg
        self.ecfg = ecfg or EngineConfig()
        self.prefill_fn, self.insert_fn, self.decode_chunk_fn = make_engine_fns(
            llm_cfg, scfg, self.ecfg
        )
        # adaptive speculation: the alternate (non-drafting) program + the
        # per-(mode, active-lanes) tokens/sec EMAs the bandit picks from
        self.decode_plain_fn = getattr(self.decode_chunk_fn, "plain", None)
        self._mode_ema: dict[tuple[str, int], float] = {}
        self._mode_seen: dict[tuple[str, int], int] = {}
        self._mode_picks: dict[int, int] = {}  # per-occupancy pick counter
        self._last_fetch_t: float | None = None
        self.spec_chunks = 0
        self.plain_chunks = 0
        self.state = init_engine_state(llm_cfg, self.ecfg)
        self._queue: queue.Queue[_Request | None] = queue.Queue()
        self._by_slot: dict[int, _Request] = {}
        # requests whose lane was retired early (budget certainly exhausted
        # in dispatched chunks) but whose final tokens are still in the
        # un-fetched pending chunk — they complete when it is processed
        self._retired: list[_Request] = []
        self._free = list(range(self.ecfg.slots))
        self._thread: threading.Thread | None = None
        self._stopped = False
        self._submit_lock = threading.Lock()  # serializes submit vs stop drain
        # deterministic admission observability: `admissions` counts lane
        # REGISTRATIONS (request visible in _by_slot, insert dispatched).
        # Tests and load tools wait on it instead of polling _by_slot — a
        # poll window that expires under host load races stop()'s contract.
        self._adm_cond = threading.Condition()
        self.admissions = 0
        # observability (bounded — a long-running server must not grow one
        # entry per chunk forever)
        from collections import deque

        self.chunks_dispatched = 0
        self.active_history: deque[int] = deque(maxlen=4096)
        self._rng0 = jax.random.PRNGKey(0)
        self._admit_count = 0
        # prompt-prefix KV cache: token-tuple -> lane-size pre_cache copy
        # (scheduler-thread only). The snapshot must be a REAL device copy —
        # a jitted identity can alias the input buffer (jit's
        # unchanged-output fast path), which the donating prefill call would
        # then invalidate. +0 forces materialized outputs; without donation
        # those are fresh allocations. All cache leaves are numeric.
        from collections import OrderedDict

        self._prefix_cache: "OrderedDict[tuple, dict]" = OrderedDict()
        self._copy_cache = jax.jit(
            lambda c: jax.tree.map(lambda x: x + jnp.zeros((), x.dtype), c)
        )
        self.prefix_hits = 0
        self.prefix_misses = 0
        # host-initiated lane stop (stop_fn hits): one tiny donating update
        # dispatched between chunks
        self._deactivate = jax.jit(
            lambda st, m: {**st, "active": st["active"] & ~m,
                           "budget": jnp.where(m, 0, st["budget"])},
            donate_argnums=(0,),
        )

    # -- public API --------------------------------------------------------

    def start(self) -> "ContinuousBatchingEngine":
        if self._thread is not None and self._thread.is_alive():
            return self  # already running (ModelServer.start after a warmup)
        self._stopped = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def warmup(self, embeds: bool = False) -> "ContinuousBatchingEngine":
        """Compile the engine's programs by EXECUTING each once on scratch /
        idle state, so the first request doesn't pay the remote compile
        while live lanes wait. (``jit.lower().compile()`` would be cheaper
        but is a no-op for this purpose: its result is discarded and does
        not seed the jit dispatch cache — verified on this jax.) The
        scheduler thread is the only dispatcher; a lazily-compiled program
        (the embeds prefill especially — nothing else exercises it) would
        otherwise block every in-flight decode for the full compile.

        Must run BEFORE serving: the insert/decode warmup calls donate and
        rewrite ``self.state`` (lane 0 is inserted with budget 0, i.e.
        inactive — harmless while idle, racy once the scheduler runs)."""
        if self.running:
            raise RuntimeError("warmup() must run before start()")
        P = self.ecfg.prefill_len
        samp_dev = {
            "greedy": jnp.asarray(True, bool),
            "temperature": jnp.asarray(1.0, jnp.float32),
            "top_k": jnp.asarray(0, jnp.int32),
            "top_p": jnp.asarray(1.0, jnp.float32),
            "seed": jnp.asarray(0, jnp.uint32),
        }
        rng = jax.random.PRNGKey(0)
        clen = jnp.asarray([1], jnp.int32)
        pre = self.prefill_fn.empty_cache()
        pre, first = self.prefill_fn(
            self.params, pre, jnp.zeros((1, P), jnp.int32), clen,
            jnp.int32(0), rng, samp_dev,
        )
        if self.ecfg.prefix_cache_entries:
            # the first prefix-cache store/hit calls _copy_cache in _admit;
            # compile it now, not on the scheduler thread mid-serving
            self._copy_cache(pre)
        if embeds:
            # prompt embeddings arrive in the model's param dtype (submit
            # coerces); a mismatched warmup dtype would compile a program
            # the real calls never hit
            pre_e = self.prefill_fn.empty_cache()
            emb = jnp.zeros((1, P, self.llm_cfg.hidden_size), self.llm_cfg.dtype)
            self.prefill_fn.embeds(
                self.params, pre_e, emb, clen, jnp.int32(0), rng, samp_dev,
            )
        # the insert call must present the SAME argument pytree structure
        # _admit uses (halt always, lane_ids when speculative): jit keys on
        # arg structure, so a halt=None warmup compiles a program the first
        # real admission never hits — recompiling on the scheduler thread
        # while live lanes wait, the exact stall warmup exists to prevent
        kw = {"halt": jnp.full((self.ecfg.max_stop_tokens,), -1, jnp.int32)}
        if self.ecfg.speculative_k:
            kw["lane_ids"] = jnp.zeros((self.ecfg.max_len,), jnp.int32)
        self.state = self.insert_fn(
            self.state, pre, jnp.int32(1), 0, first, jnp.int32(0), samp_dev,
            **kw,
        )
        out = self.decode_chunk_fn(self.params, self.state)
        self.state = out[0]
        if self.decode_plain_fn is not None:
            out = self.decode_plain_fn(self.params, self.state)
            self.state = out[0]
        # _deactivate fires mid-serving on the first host-side stop-string
        # hit; compile it now (all-False mask is a no-op on the state)
        self.state = self._deactivate(
            self.state, jnp.zeros_like(self.state["active"])
        )
        # force completion with a real fetch (block_until_ready can ack
        # early through the axon tunnel — CLAUDE.md)
        np.asarray(out[3])
        return self

    def wait_for_admissions(self, n: int, timeout: float | None = None) -> bool:
        """Block until ``n`` total lane registrations have happened since
        construction (deterministic alternative to polling ``_by_slot``).
        Returns False on timeout."""
        with self._adm_cond:
            return self._adm_cond.wait_for(
                lambda: self.admissions >= n, timeout)

    def stop(self) -> None:
        """Stop the loop and fail anything not finished — stranding queued
        or in-flight requests would block each submitter for its full
        timeout.

        Contract (tested in tests/test_engine.py):
        - queued-but-not-admitted requests fail with "engine stopped";
        - in-flight (admitted) requests fail with "engine stopped" and
          their device lanes are deactivated once the scheduler exits;
        - a request whose admission raced stop() (popped from the queue,
          not yet registered) is failed by ``_admit``'s registration check,
          which also deactivates the lane its insert just activated."""
        with self._submit_lock:
            self._stopped = True
        self._queue.put(None)
        t = self._thread
        if t:
            t.join(timeout=30)
            if not t.is_alive():
                self._thread = None
        exc = RuntimeError("engine stopped")
        # the sweep shares _submit_lock with _admit's registration: after a
        # timed-out join the scheduler thread may still be live (e.g. stuck
        # in a multi-minute remote compile), and an unsynchronized register
        # racing this sweep would strand its request un-failed until the
        # submitter's own timeout
        swept_any = False
        with self._submit_lock:
            for slot in list(self._by_slot):
                # default=None: a still-live scheduler's _finish/retirement
                # can pop the slot between our snapshot and here
                req = self._by_slot.pop(slot, None)
                if req is None:
                    continue
                swept_any = True
                req.error = exc
                req.done.set()
            # rebuild rather than append per slot: a racing _finish may have
            # freed a slot already, and a duplicate entry would admit two
            # requests into the same lane after a restart
            self._free = [s for s in range(self.ecfg.slots)
                          if s not in self._by_slot]
            for req in self._retired:
                # a retired lane was freed host-side but its device active
                # flag clears only when a later chunk processes — none will
                # after stop, so it needs the deactivation sweep too
                swept_any = True
                req.error = exc
                req.done.set()
            self._retired = []
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req is not None:
                    req.error = exc
                    req.done.set()
        # swept lanes still have active=True in the device state: after a
        # stop()+start() they would decode as zombies, burning up to
        # slots-1 lanes of forward passes per chunk on garbage nobody
        # routes. Deactivate them — but only if the scheduler thread really
        # exited (a live thread may be mid-dispatch on self.state, and
        # _deactivate donates its input).
        if swept_any and self._thread is None:
            try:
                self.state = self._deactivate(
                    self.state, jnp.ones_like(self.state["active"])
                )
            except Exception:
                logger.exception("post-stop lane deactivation failed")

    def submit(
        self,
        prompt_ids: list[int] | None = None,
        max_new_tokens: int = 128,
        timeout: float | None = 600.0,
        stream: Callable[[int], None] | None = None,
        greedy: bool | None = None,
        temperature: float | None = None,
        top_k: int | None = None,
        top_p: float | None = None,
        prompt_embeds=None,
        seed: int | None = None,
        stop_token_ids=(),
        stop_fn=None,
    ) -> list[int]:
        """Block until the request finishes; returns generated token ids
        (EOS excluded). Prompts prefill in chunks; longer than the lane
        (max_len - 1) truncates from the LEFT (keep recent context).

        ``prompt_embeds`` ([S, H], instead of ``prompt_ids``) serves a
        MULTIMODAL prompt — pre-spliced embeddings from
        ``multimodal_embed`` (CLIP features, dream queries) prefill through
        a dedicated compiled program and then decode exactly like any other
        lane. Embeds prompts bypass the prompt-prefix cache (keys are token
        tuples).

        ``greedy``/``temperature``/``top_k``/``top_p`` override the engine's
        SamplingConfig FOR THIS REQUEST only — lanes with different sampling
        settings decode together in the same compiled chunk (per-row
        sampling; ``sample_token_per_row``). Passing any of
        temperature/top_k/top_p implies ``greedy=False`` unless ``greedy``
        is given explicitly.

        ``stop_token_ids`` (up to ``EngineConfig.max_stop_tokens``) halt the
        lane device-side WITHOUT emitting the token (EOS semantics — the
        reference's separator stop + strip). ``stop_fn`` is a host predicate
        over the accumulated generated ids, checked at chunk boundaries for
        multi-token stop strings (``generation.stopping.make_stop_fn``); the
        lane retires within a chunk of it returning True. Either way the
        caller truncates the decoded text with ``truncate_at_stop``."""
        s = self.scfg
        if greedy is None:
            greedy = (s.greedy if temperature is None and top_k is None
                      and top_p is None else False)
        samp = {
            "greedy": bool(greedy),
            "temperature": float(s.temperature if temperature is None else temperature),
            "top_k": int(s.top_k if top_k is None else top_k),
            "top_p": float(s.top_p if top_p is None else top_p),
            # per-request sampling-stream seed: same (seed, prompt, params)
            # → same sampled output, independent of slot placement or
            # co-tenants. None → a per-admission unique seed.
            "seed": None if seed is None else int(seed) & 0xFFFFFFFF,
        }
        # these reach a compiled sampler and (via the HTTP contract) are
        # CLIENT-controlled — reject values that poison the row
        from dreamllm_tpu.generation.sampler import validate_sampling

        validate_sampling(samp["temperature"], samp["top_k"], samp["top_p"])
        from dreamllm_tpu.utils.errors import ClientError

        if prompt_embeds is not None:
            if prompt_ids is not None:
                raise ValueError("pass prompt_ids OR prompt_embeds, not both")
            # keep device arrays on device — fetching [S, H] floats to host
            # only to re-upload them chunk-by-chunk costs two full prompt
            # transfers through the tunnel per request
            embeds = (prompt_embeds if isinstance(prompt_embeds, jax.Array)
                      else np.asarray(prompt_embeds))
            if embeds.ndim != 2 or embeds.shape[0] < 1:
                raise ClientError(
                    f"prompt_embeds must be [S>=1, H], got {embeds.shape}"
                )
            if embeds.shape[1] != self.llm_cfg.hidden_size:
                raise ClientError(
                    f"prompt_embeds hidden dim {embeds.shape[1]} != model "
                    f"hidden_size {self.llm_cfg.hidden_size}"
                )
            if embeds.dtype != self.llm_cfg.dtype:
                # coerce HERE, not inside the jitted chunk: the compiled
                # program is keyed on the input dtype, and a float32/float64
                # array would lazily compile a second program on the
                # scheduler thread — stalling every live lane — instead of
                # hitting the one warmup() prepared
                embeds = jnp.asarray(embeds, self.llm_cfg.dtype)
            if embeds.shape[0] > self.ecfg.max_len - 1:
                # ids prompts left-truncate, but an embeds prompt's span
                # structure (image patches, dream queries) is opaque here —
                # a silent cut could hand the model half an image
                raise ClientError(
                    f"prompt_embeds length {embeds.shape[0]} exceeds the "
                    f"lane capacity {self.ecfg.max_len - 1}; shorten the "
                    "prompt (embeds prompts are not auto-truncated)"
                )
            req = _Request([], max_new_tokens, stream, samp, embeds=embeds,
                           stop_ids=stop_token_ids, stop_fn=stop_fn)
        else:
            req = _Request(list(prompt_ids or []), max_new_tokens, stream, samp,
                           stop_ids=stop_token_ids, stop_fn=stop_fn)
            if not req.ids:
                raise ClientError("empty prompt (prepend a BOS token)")
        if len(req.stop_ids) > self.ecfg.max_stop_tokens:
            raise ClientError(
                f"{len(req.stop_ids)} stop_token_ids exceed the engine's "
                f"max_stop_tokens={self.ecfg.max_stop_tokens}"
            )
        with self._submit_lock:
            if self._stopped:
                raise RuntimeError("engine stopped")
            self._queue.put(req)
        if not req.done.wait(timeout):
            # best-effort cancel: a still-queued request is skipped at
            # admission instead of burning a lane (and its stream callback)
            # for a client that already gave up. Post-admission there is no
            # cancel — the lane finishes its budget.
            req.abandoned = True
            raise TimeoutError("engine request timed out")
        if req.error is not None:
            raise req.error
        return req.tokens

    # -- engine loop ---------------------------------------------------------

    def _admit(self, req: _Request) -> None:
        P = self.ecfg.prefill_len
        # the lane must hold prompt + at least one generated token; overlong
        # prompts keep their most recent context (left truncation) but BOS
        # survives at position 0 — LLaMA-family models are calibrated with it
        # present (same rule as batching.make_batched_generate_fn)
        cap = self.ecfg.max_len - 1
        ids, emb = req.ids, req.embeds
        if emb is not None:
            plen = emb.shape[0]  # overlong embeds were rejected at submit
        else:
            from dreamllm_tpu.serve.batching import left_truncate_keep_bos

            ids = left_truncate_keep_bos(ids, cap, self.ecfg.bos_token_id)
            plen = len(ids)
        self._admit_count += 1
        rng = jax.random.fold_in(self._rng0, self._admit_count)
        samp = req.samp or {
            "greedy": self.scfg.greedy, "temperature": self.scfg.temperature,
            "top_k": self.scfg.top_k, "top_p": self.scfg.top_p, "seed": None,
        }
        # no explicit seed → a per-admission unique stream (concurrent
        # identical sampled prompts should not produce identical outputs
        # unless the client pins a seed)
        seed = samp.get("seed")
        if seed is None:
            seed = self._admit_count
        samp_dev = {
            "greedy": jnp.asarray(samp["greedy"], bool),
            "temperature": jnp.asarray(samp["temperature"], jnp.float32),
            "top_k": jnp.asarray(samp["top_k"], jnp.int32),
            "top_p": jnp.asarray(samp["top_p"], jnp.float32),
            "seed": jnp.asarray(seed, jnp.uint32),
        }
        # chunked prefill: host loop of P-token compiled appends — prompts
        # longer than prefill_len no longer truncate to it.
        # Prefix cache: a stored full-chunk prefix (k*P tokens, k*P < plen)
        # skips those chunks' compute — K/V rows don't depend on the
        # request's rng/sampling (those only pick `first` from the FINAL
        # chunk's logits, which always runs), so reuse is exact.
        pre_cache, start0 = None, 0
        # embeds prompts bypass the prefix cache (keys are token tuples)
        n_entries = 0 if emb is not None else self.ecfg.prefix_cache_entries
        # usable prefix length of THIS prompt, floored to full chunks (the
        # final — possibly partial — chunk must always run to produce `first`)
        store_at = ((plen - 1) // P) * P if n_entries else 0
        if n_entries and store_at:
            # An entry stored for a LONGER prefix serves any chunk-aligned
            # prefix of itself: its rows beyond the match are stale but get
            # overwritten by this prompt's remaining prefill chunks or
            # masked by the lane's seg metadata at insert. So match each
            # entry on the longest common chunk-aligned prefix.
            best_k, best_key = 0, None
            for key in self._prefix_cache:
                m = min(len(key), store_at) // P
                for k in range(m, best_k, -1):
                    if tuple(ids[: k * P]) == key[: k * P]:
                        best_k, best_key = k, key
                        break
            if best_k:
                self._prefix_cache.move_to_end(best_key)
                # copy: the loop below donates pre_cache into prefill
                pre_cache = self._copy_cache(self._prefix_cache[best_key])
                start0 = best_k * P
                self.prefix_hits += 1
        if pre_cache is None:
            pre_cache = self.prefill_fn.empty_cache()
            if n_entries and store_at:  # don't count cache-inapplicable
                self.prefix_misses += 1  # (too-short) prompts as misses
        first = None
        for start in range(start0, plen, P):
            if store_at and start == store_at:
                # store this prompt's own longest full-chunk prefix — unless
                # an existing entry already covers it (is an extension of it)
                key = tuple(ids[:store_at])
                covered = any(
                    len(k2) >= store_at and k2[:store_at] == key
                    for k2 in self._prefix_cache
                )
                if not covered:
                    # the new longer entry serves every chunk-aligned prefix
                    # of itself — drop stored entries it covers (each holds
                    # a lane-size HBM buffer; a redundant one wastes a slot)
                    for k2 in [k2 for k2 in self._prefix_cache
                               if len(k2) < store_at and key[: len(k2)] == k2]:
                        del self._prefix_cache[k2]
                    self._prefix_cache[key] = self._copy_cache(pre_cache)
                    while len(self._prefix_cache) > n_entries:
                        self._prefix_cache.popitem(last=False)  # evict LRU
            if emb is not None:
                clen = min(P, plen - start)
                # device-side chunking: slice + pad are dispatched ops, not
                # host round-trips (emb may live on device the whole time)
                chunk = jnp.asarray(emb[start : start + P])
                if clen < P:
                    chunk = jnp.pad(chunk, ((0, P - clen), (0, 0)))
                pre_cache, first = self.prefill_fn.embeds(
                    self.params, pre_cache, chunk[None],
                    jnp.asarray([clen], jnp.int32), jnp.int32(start),
                    rng, samp_dev,
                )
            else:
                chunk = ids[start : start + P]
                padded = np.zeros((1, P), np.int32)
                padded[0, : len(chunk)] = chunk
                pre_cache, first = self.prefill_fn(
                    self.params, pre_cache, jnp.asarray(padded),
                    jnp.asarray([len(chunk)], jnp.int32), jnp.int32(start), rng,
                    samp_dev,
                )
        slot = self._free.pop()
        try:
            budget = min(req.max_new_tokens, self.ecfg.max_len - plen)
            kw = {}
            halt = np.full((self.ecfg.max_stop_tokens,), -1, np.int32)
            if req.stop_ids:
                halt[: len(req.stop_ids)] = req.stop_ids
            kw["halt"] = jnp.asarray(halt)
            if self.ecfg.speculative_k:
                lane = np.zeros((self.ecfg.max_len,), np.int32)
                if ids:  # embeds prompts draft from generated tokens only
                    lane[: len(ids)] = ids
                kw["lane_ids"] = jnp.asarray(lane)
            self.state = self.insert_fn(
                self.state, pre_cache, jnp.int32(plen), slot, first,
                jnp.int32(budget), samp_dev, **kw,
            )
        except Exception as e:
            self._free.append(slot)  # don't leak the lane on a failed insert
            # insert_fn donates state: a failed execution may have poisoned
            # it, taking every other lane down with it — reset visibly
            self._fail_all(e)
            raise
        req.slot = slot
        # no host sync here: admission is dispatch-only (prefill chunks +
        # insert are enqueued; nothing blocks on the device). A budget<=0 or
        # first-token-EOS lane was inserted inactive and finishes when its
        # first chunk's results come back.
        req.chunk_joined = self.chunks_dispatched
        req.chunk_last = req.chunk_joined + -(-max(budget, 0) // self.ecfg.chunk_steps) - 1
        # registration is mutually exclusive with stop()'s sweep (see stop):
        # if stop ran between our loop-top _stopped check and here, failing
        # the request NOW is the only way its submitter ever wakes up
        with self._submit_lock:
            if self._stopped:
                # stop()'s sweep may ALREADY have rebuilt _free with this
                # slot (a timed-out join while we were blocked in the insert
                # dispatch above) — an unconditional append would duplicate
                # the slot and admit two requests into the same lane after
                # a restart
                if slot not in self._free:
                    self._free.append(slot)
                # the insert above already flipped this lane active on
                # device, and stop()'s sweep (which ran before or runs
                # concurrently with this block) saw an empty _by_slot — its
                # post-stop deactivation won't cover us. Without this, a
                # stop()+start() resumes the lane as a zombie burning decode
                # work on garbage nobody routes (the exact bug
                # test_stop_with_inflight_deactivates_lanes_for_restart
                # exists to catch; it fired whenever stop() landed inside
                # this admission window).
                try:
                    mask = np.zeros((self.ecfg.slots,), bool)
                    mask[slot] = True
                    self.state = self._deactivate(self.state, jnp.asarray(mask))
                except Exception:
                    logger.exception("stop-race lane deactivation failed")
                req.error = RuntimeError("engine stopped")
                req.done.set()
                return
            self._by_slot[slot] = req
        with self._adm_cond:
            self.admissions += 1
            self._adm_cond.notify_all()

    def _finish(self, slot: int) -> None:
        req = self._by_slot.pop(slot)
        self._free.append(slot)
        req.done.set()

    @staticmethod
    def _deliver(req, row_toks, row_valid) -> None:
        """Append one chunk row's valid tokens to ``req`` (+ stream them).
        A raising stream callback must not kill the scheduler thread: it is
        logged once and streaming is disabled for that request — tokens
        still accumulate and the submitter gets them on completion."""
        for t, ok in zip(row_toks, row_valid):
            if not ok:
                continue
            t = int(t)
            req.tokens.append(t)
            if req.stream:
                try:
                    req.stream(t)
                except Exception:
                    logger.exception("stream callback failed; disabling")
                    req.stream = None

    def _route(self, toks: np.ndarray, valid: np.ndarray, chunk_idx: int) -> None:
        """Distribute a chunk's [B, K] tokens to their requests. Routing is
        by the per-step validity mask, NOT by comparing against the pad id —
        a genuinely generated pad-id token (LLaMA <unk> is id 0) stays.
        Requests that joined AFTER this chunk was dispatched (recycled lane)
        are skipped — the lane's rows in this chunk belong to its previous,
        already-finished occupant (all valid=False, but skip explicitly)."""
        for slot, req in list(self._by_slot.items()):
            if req.chunk_joined > chunk_idx:
                continue
            self._deliver(req, toks[slot], valid[slot])

    def _fail_all(self, exc: Exception) -> None:
        """A scheduler-loop error poisons every in-flight request visibly
        (instead of leaving submitters to hit their timeouts), frees their
        lanes, AND re-initializes the device state: insert/decode donate
        ``state``, so after a failed execution the old buffers may already be
        invalidated — without a fresh init every later chunk would fail too
        (a permanent outage from one transient fault)."""
        logger.exception("engine loop error")
        for slot in list(self._by_slot):
            req = self._by_slot.pop(slot)
            req.error = exc
            req.done.set()
        for req in self._retired:
            req.error = exc
            req.done.set()
        self._retired = []
        self._free = list(range(self.ecfg.slots))
        try:
            self.state = init_engine_state(
                self.llm_cfg, self.ecfg,
                rng=jax.random.fold_in(self._rng0, self._admit_count),
            )
        except Exception:
            logger.exception("engine state re-init failed; engine is down")
            self._stopped = True

    def _pick_decode_fn(self):
        """Epsilon-greedy bandit over {spec, plain} keyed by the active-lane
        count: each arm's reward is the measured tokens/sec of its chunks at
        that occupancy. Sparse lanes -> verify rides the weight-read
        bandwidth and drafting wins; dense lanes -> the (1+k)-wide verify is
        compute-bound and plain decode wins (BENCH r3: 399 vs 428 tok/s at 8
        lanes). Unseen arms are probed first; the losing arm is re-probed
        every 32nd chunk at that occupancy so the estimate tracks load."""
        mode0 = "spec" if self.ecfg.speculative_k else "plain"
        if self.decode_plain_fn is None:
            return self.decode_chunk_fn, mode0
        bucket = len(self._by_slot)
        ks, kp = ("spec", bucket), ("plain", bucket)
        ns, npl = self._mode_seen.get(ks, 0), self._mode_seen.get(kp, 0)
        if ns == 0:
            return self.decode_chunk_fn, "spec"
        if npl == 0:
            return self.decode_plain_fn, "plain"
        spec_better = self._mode_ema[ks] >= self._mode_ema[kp]
        # re-probe the losing arm every 32nd PICK at this occupancy. The
        # pick counter (not ns+npl) advances even when rewards are dropped
        # as admission-polluted — keyed on sample counts, a frozen count
        # that happened to land on a multiple of 32 would invert the choice
        # for EVERY chunk of a sustained-churn burst
        picks = self._mode_picks.get(bucket, 0) + 1
        self._mode_picks[bucket] = picks
        if picks % 32 == 0:
            spec_better = not spec_better
        if spec_better:
            return self.decode_chunk_fn, "spec"
        return self.decode_plain_fn, "plain"

    def _note_mode_result(self, mode: str, bucket: int, toks_per_s: float) -> None:
        k = (mode, bucket)
        self._mode_seen[k] = self._mode_seen.get(k, 0) + 1
        prev = self._mode_ema.get(k)
        self._mode_ema[k] = (toks_per_s if prev is None
                             else 0.8 * prev + 0.2 * toks_per_s)

    def _loop(self) -> None:
        """Pipelined scheduler: dispatch chunk N+1 BEFORE fetching chunk N's
        results. JAX dispatch is async, so the host's fetch + routing of
        chunk N overlaps the device executing chunk N+1 — the per-chunk
        device→host round-trip (≈24 ms through the axon tunnel) and the
        python routing work leave the critical path entirely. Cost: results
        (and therefore finishes, lane frees, and stream callbacks) lag one
        chunk behind dispatch — bounded extra latency, no lost tokens (a
        finished lane decodes one extra chunk with active=False, emitting
        only masked-invalid rows)."""
        pending = None  # (chunk_idx, toks, valid, active) — device futures
        while not self._stopped:
            # retire lanes whose occupant has CERTAINLY exhausted its budget
            # in the chunks already dispatched (≤ chunk_steps emissions per
            # chunk): the successor's insert enqueues behind the in-flight
            # chunk with ZERO idle chunks. EOS-terminated requests (not
            # predictable host-side) still free one chunk later via the
            # active-mask path below.
            for slot in list(self._by_slot):
                r = self._by_slot[slot]
                if self.chunks_dispatched > r.chunk_last:
                    del self._by_slot[slot]
                    self._free.append(slot)
                    if pending is None:
                        # every chunk it could emit in is already processed
                        r.done.set()
                    else:
                        self._retired.append(r)
            # admit as many waiting requests as there are free lanes; block
            # only when fully idle (no lanes busy AND no results in flight)
            block = not self._by_slot and pending is None
            req = None
            admits = 0  # admissions this iteration (pollute chunk timing)
            while self._free:
                try:
                    req = self._queue.get(block=block, timeout=None if not block else 0.1)
                except queue.Empty:
                    break
                if req is None:
                    return
                if req.abandoned:  # submitter already timed out
                    req.done.set()
                    block = False
                    continue
                try:
                    self._admit(req)
                    admits += 1
                except Exception as e:
                    req.error = e
                    req.done.set()
                    logger.exception("admission failed")
                block = False
            new_pending = None
            if self._by_slot:
                try:
                    chunk_idx = self.chunks_dispatched
                    fn, mode = self._pick_decode_fn()
                    if mode == "spec":
                        self.spec_chunks += 1
                    else:
                        self.plain_chunks += 1
                    dispatch_t = time.perf_counter()
                    self.state, toks, valid, active = fn(self.params, self.state)
                    self.chunks_dispatched += 1
                    self.active_history.append(len(self._by_slot))
                    new_pending = (chunk_idx, toks, valid, active, mode,
                                   dispatch_t, len(self._by_slot), admits)
                except Exception as e:
                    pending = None  # failed run invalidates in-flight buffers
                    self._fail_all(e)
                    continue
            else:
                self._last_fetch_t = None  # pipeline drained; timing resets
            if pending is not None:
                try:
                    (chunk_idx, toks, valid, active, mode, dispatch_t, bucket,
                     disp_admits) = pending
                    # ONE batched fetch: device_get pre-issues the async
                    # copies for all three arrays before blocking, vs three
                    # sequential ~24 ms tunnel round-trips
                    toks_np, valid_np, active_np = jax.device_get(
                        (toks, valid, active))
                    toks_np = np.asarray(toks_np)
                    valid_np = np.asarray(valid_np)
                    active_np = np.asarray(active_np)
                except Exception as e:
                    pending = None
                    self._fail_all(e)
                    continue
                if self.decode_plain_fn is not None:
                    # chunk duration: since the previous fetch when the
                    # pipeline was full (device back-to-back), since this
                    # chunk's dispatch when it had drained
                    now = time.perf_counter()
                    t0 = (self._last_fetch_t
                          if self._last_fetch_t is not None else dispatch_t)
                    dt = max(now - max(t0, dispatch_t), 1e-6)
                    # a window that contained admissions measures prefill
                    # device work (admits dispatched before this chunk) or
                    # _admit host time (admits this iteration) on top of the
                    # chunk — feeding that into the bandit systematically
                    # deflates whichever arm runs next to admissions (mostly
                    # the current winner), so polluted rewards are dropped.
                    # EXCEPT as the arm's first sample at this occupancy:
                    # under sustained churn every window has admissions, and
                    # an unseen arm must still get bootstrapped or the bandit
                    # would probe one mode forever without ever comparing
                    polluted = bool(disp_admits or admits)
                    if not polluted or (mode, bucket) not in self._mode_seen:
                        self._note_mode_result(
                            mode, bucket, float(valid_np.sum()) / dt
                        )
                    self._last_fetch_t = now
                self._route(toks_np, valid_np, chunk_idx)
                # drain early-retired requests: route their final rows from
                # this chunk (their lane may already host a successor, whose
                # chunk_joined > chunk_idx keeps the streams disjoint), then
                # complete the ones whose last possible chunk this was
                still = []
                for r in self._retired:
                    if r.chunk_joined <= chunk_idx <= r.chunk_last:
                        self._deliver(r, toks_np[r.slot], valid_np[r.slot])
                    if chunk_idx >= r.chunk_last:
                        r.done.set()
                    else:
                        still.append(r)
                self._retired = still
                for slot in list(self._by_slot):
                    r = self._by_slot[slot]
                    if r.chunk_joined <= chunk_idx and not active_np[slot]:
                        self._finish(slot)
                # host-side stop strings: a multi-token separator in the
                # accumulated text retires the lane now (the in-flight chunk
                # may still decode it; its rows are dropped at routing since
                # the request is finished). Caller truncates the text.
                host_stops = []
                for slot in list(self._by_slot):
                    r = self._by_slot[slot]
                    if (r.stop_fn is not None and r.chunk_joined <= chunk_idx
                            and r.tokens):
                        try:
                            hit = bool(r.stop_fn(r.tokens))
                        except Exception:
                            logger.exception("stop_fn failed; disabling")
                            r.stop_fn = None
                            continue
                        if hit:
                            host_stops.append(slot)
                if host_stops:
                    mask = np.zeros((self.ecfg.slots,), bool)
                    mask[host_stops] = True
                    try:
                        self.state = self._deactivate(
                            self.state, jnp.asarray(mask)
                        )
                    except Exception as e:
                        pending = None
                        self._fail_all(e)
                        continue
                    for slot in host_stops:
                        self._finish(slot)
            pending = new_pending
