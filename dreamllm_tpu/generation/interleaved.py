"""Free-form interleaved text+image generation — the first-class API the
reference never shipped.

The reference trains the model to emit ``<dream_start>`` at image positions
(only ``<dream_start>`` stays learnable in interleaved labels,
builder_dreamllm.py:284-288) and ships all the pieces — dream-query append
(modeling_dreamllm.py:1161-1169, :1657-1669) and the SD pipeline — but the
decode-then-diffuse driver is left to the user (SURVEY.md §3 note). This
module implements it:

  decode text → model emits ``<dream_start>`` → append the 64 learned dream
  queries through the KV cache → their last hidden states condition the SD
  head → image → append ``<dream_end>`` (+ optionally the CLIP-encoded image
  span, matching the stage-2 training distribution of dream_ids+image_ids,
  builder_dreamllm.py:264) → continue decoding … until EOS.

Orchestration is a host loop over COMPILED segments: every LLM stage
(prefill, text-segment decode, dream-query append, span tail) is a jitted
program with params as explicit arguments, built once per
(config, sampling, budget) via an lru_cache factory. Through the remote-TPU
tunnel an eager llama_forward is hundreds of ~24 ms dispatches and a
re-traced while_loop re-traces the whole 32-layer body per segment — jitted
stages make the host↔device seam per segment a handful of dispatches plus
two scalar fetches (n, reason). Image synthesis itself is rare and heavy
next to token decode, so the host round-trip per image is noise. Batch 1.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from dreamllm_tpu.generation.sampler import SamplingConfig, sample_token
from dreamllm_tpu.models.clip import clip_preprocess
from dreamllm_tpu.models.dreamllm import (
    DreamLLMConfig,
    multimodal_embed,
    unconditional_dream_hidden,
)
from dreamllm_tpu.models.llama import init_kv_cache, llama_forward, llama_logits
from dreamllm_tpu.models.sd.head import SDHeadConfig, sd_head_pipeline


@dataclasses.dataclass(frozen=True)
class InterleavedConfig:
    max_new_tokens: int = 512           # total token budget (text + spans)
    max_images: int = 4
    num_inference_steps: int = 50
    guidance_scale: float = 3.5
    image_height: int | None = None
    image_width: int | None = None
    sampler: str = "dpm"
    append_image_span: bool = True      # re-encode generated image via CLIP
    # Scripted image trigger: force an image after exactly N emitted tokens
    # per text segment, as if the model had emitted <dream_start> (the token
    # at that position is consumed as the control token). For demos and
    # benchmarks with untrained weights — a random model never emits
    # <dream_start>; trained models leave this None and route on the real
    # token (the trained behavior, builder_dreamllm.py:284-288).
    force_image_interval: int | None = None
    sampling: SamplingConfig = dataclasses.field(default_factory=SamplingConfig)


@functools.lru_cache(maxsize=8)
def _interleaved_fns(cfg: DreamLLMConfig, scfg: SamplingConfig, max_seg: int,
                     append_image_span: bool,
                     force_image_interval: int | None = None):
    """Jitted stage programs for ``generate_interleaved``.

    Cached on the hashable static recipe; array shapes (prompt length, cache
    length) key the inner jit caches as usual. Params are explicit jit
    arguments — closed-over arrays would be inlined into the serialized HLO
    (a 7 GB constant blob this environment's remote compiler rejects).
    """
    llm = cfg.llm
    st = cfg.special_tokens

    @jax.jit
    def prefill(params, embeds, cache, rng):
        """Prompt embeds → warmed cache + sampled first token ([1])."""
        out = llama_forward(params["llm"], llm, inputs_embeds=embeds, kv_cache=cache)
        logits = llama_logits(params["llm"], llm, out["last_hidden_state"][:, -1:])[:, 0]
        rng, sub = jax.random.split(rng)
        return out["kv_cache"], sample_token(logits, sub, scfg), rng

    @jax.jit
    def decode(params, first_tok, cache, start_pos, budget, rng):
        """Greedy/sampled decode until eos / <dream_start> / budget.

        Returns (n_emitted, toks[max_seg], reason, cache, rng) with reason
        0=budget 1=eos 2=<dream_start> 3=user stop token (stored).
        """

        def step(state):
            i, tok, toks, stop_reason, cache, rng = state
            rng, sub = jax.random.split(rng)
            positions = jnp.asarray([[0]], jnp.int32) + start_pos + i
            o = llama_forward(
                params["llm"], llm, input_ids=tok[None],
                segment_ids=jnp.ones((1, 1), jnp.int32),
                positions=positions, kv_cache=cache,
            )
            lg = llama_logits(params["llm"], llm, o["last_hidden_state"])[:, 0]
            nxt = sample_token(lg, sub, scfg)  # [1]
            toks = jax.lax.dynamic_update_slice(toks, tok, (i,))
            is_eos = tok[0] == scfg.eos_token_id
            is_dream = tok[0] == st.dream_start
            if force_image_interval:  # scripted trigger (see InterleavedConfig)
                is_dream = is_dream | (i == force_image_interval - 1)
            is_stop = jnp.zeros((), bool)
            for t_ in scfg.stop_tokens:  # user stop tokens: stored, then halt
                is_stop = is_stop | (tok[0] == t_)
            reason = jnp.where(
                is_eos, 1, jnp.where(is_dream, 2, jnp.where(is_stop, 3, 0))
            )
            return i + 1, nxt, toks, reason, o["kv_cache"], rng

        def cond(state):
            i, _, _, reason, _, _ = state
            return (i < budget) & (reason == 0)

        toks0 = jnp.full((max_seg,), scfg.pad_token_id, jnp.int32)
        n, nxt, toks, reason, cache, rng = jax.lax.while_loop(
            cond, step, (jnp.int32(0), first_tok, toks0, jnp.int32(0), cache, rng)
        )
        return n, toks, reason, cache, rng

    @jax.jit
    def dream_append(params, cache, cur_pos):
        """Append the 64 dream queries; their hidden states condition the head."""
        q = params["dream_embedding"]["queries"][None]  # [1, 64, H]
        positions = cur_pos + jnp.arange(cfg.n_dream_queries, dtype=jnp.int32)[None]
        o = llama_forward(
            params["llm"], llm,
            inputs_embeds=q.astype(params["llm"]["embed_tokens"].dtype),
            segment_ids=jnp.ones((1, cfg.n_dream_queries), jnp.int32),
            positions=positions, kv_cache=cache,
        )
        return o["kv_cache"], o["last_hidden_state"]  # [1, 64, H]

    if append_image_span:
        tail_list = ([st.dream_end, st.im_start]
                     + [st.im_patch] * cfg.image_embed_len + [st.im_end])
    else:
        tail_list = [st.dream_end]
    tail_const = jnp.asarray([tail_list], jnp.int32)
    tail_len = len(tail_list)

    @jax.jit
    def tail_append(params, cache, cur_pos, img, rng):
        """Close the span: <dream_end> (+ CLIP-encoded generated image, the
        stage-2 training distribution of dream_ids+image_ids, builder :264),
        then sample the next segment's first token."""
        if append_image_span:
            clip_img = clip_preprocess(img[None], cfg.vision.image_size)
            embeds = multimodal_embed(
                params, cfg, tail_const,
                images=clip_img[:, None],
                image_positions=jnp.asarray([[2]], jnp.int32),
            )
        else:
            embeds = multimodal_embed(params, cfg, tail_const)
        positions = cur_pos + jnp.arange(tail_len, dtype=jnp.int32)[None]
        o = llama_forward(
            params["llm"], llm, inputs_embeds=embeds,
            segment_ids=jnp.ones((1, tail_len), jnp.int32),
            positions=positions, kv_cache=cache,
        )
        logits = llama_logits(params["llm"], llm, o["last_hidden_state"][:, -1:])[:, 0]
        rng, sub = jax.random.split(rng)
        return o["kv_cache"], sample_token(logits, sub, scfg), rng

    uncond = jax.jit(lambda p: unconditional_dream_hidden(p, cfg))

    return {
        "prefill": prefill,
        "decode": decode,
        "dream": dream_append,
        "tail": tail_append,
        "tail_len": tail_len,
        "uncond": uncond,
    }


def generate_interleaved(
    params,
    cfg: DreamLLMConfig,
    head_params,
    head_cfg: SDHeadConfig,
    input_ids: jnp.ndarray,             # [1, S] prompt (no padding)
    icfg: InterleavedConfig,
    rng: jax.Array,
    *,
    prompt_images: jnp.ndarray | None = None,       # [1, M, H, W, 3]
    prompt_image_positions: jnp.ndarray | None = None,
    pipeline_fn=None,                               # default sd_head_pipeline
) -> dict:
    """Returns {"segments": [("text", ids) | ("image", array)], "images": [...]}.

    The output interleaves decoded token-id arrays with generated images
    ([H, W, 3] float in [0, 1]) in document order.

    ``pipeline_fn(head_params, head_cfg, cond, uncond, rng, *, height, width,
    num_inference_steps, guidance_scale, sampler)`` synthesizes the image.
    When omitted it is picked from the head config type: an
    ``SDXLHeadConfig`` routes to ``sdxl_head_pipeline`` (dual conditioning),
    anything else to ``sd_head_pipeline``.
    """
    if pipeline_fn is None:
        from dreamllm_tpu.models.sd.sdxl import SDXLHeadConfig, sdxl_head_pipeline

        pipeline_fn = (
            sdxl_head_pipeline if isinstance(head_cfg, SDXLHeadConfig) else sd_head_pipeline
        )
    llm = cfg.llm
    assert input_ids.shape[0] == 1, "interleaved generation is batch-1"
    s0 = int(input_ids.shape[1])

    span_len = icfg.max_images * (
        cfg.n_dream_queries + 2 + (cfg.image_embed_len + 2 if icfg.append_image_span else 0)
    )
    max_len = s0 + icfg.max_new_tokens + span_len
    cache = init_kv_cache(llm, 1, max_len)

    scfg = icfg.sampling
    max_seg = icfg.max_new_tokens  # static buffer: no recompiles as the
    # remaining budget shrinks (budget is a traced operand below)
    fns = _interleaved_fns(cfg, scfg, max_seg, icfg.append_image_span,
                           icfg.force_image_interval)

    # ---- prefill on the (optionally multimodal) prompt ----
    # the multimodal splice (CLIP encode + scatter) stays OUTSIDE the cached
    # jit (image count M varies per call); it is itself XLA ops end-to-end
    embeds = multimodal_embed(
        params, cfg, input_ids,
        images=prompt_images, image_positions=prompt_image_positions,
    )
    cache, first_tok, rng = fns["prefill"](params, embeds, cache, rng)
    cur_pos = s0  # next absolute position

    uncond = fns["uncond"](params)

    segments: list = []
    images: list = []
    budget = icfg.max_new_tokens

    while budget > 0:
        n, toks, reason, cache, rng = fns["decode"](
            params, first_tok[:1].reshape(1), cache, jnp.int32(cur_pos),
            jnp.int32(budget), rng,
        )
        n = int(n)
        reason = int(reason)
        seg_toks = jnp.asarray(toks)[:n]
        cur_pos += n
        budget -= n
        if n > 0:
            # drop the control token (eos/<dream_start>) from the visible
            # text; a user stop token (reason 3) stays, matching
            # generate_text's stored-then-halt semantics
            visible = seg_toks[:-1] if reason in (1, 2) else seg_toks
            if visible.shape[0] > 0:
                segments.append(("text", visible))
        if reason != 2 or len(images) >= icfg.max_images:
            break

        # ---- <dream_start> emitted: append the 64 dream queries ----
        cache, cond = fns["dream"](params, cache, jnp.int32(cur_pos))
        cur_pos += cfg.n_dream_queries

        rng, sub = jax.random.split(rng)
        img = pipeline_fn(
            head_params, head_cfg, cond, uncond, sub,
            height=icfg.image_height, width=icfg.image_width,
            num_inference_steps=icfg.num_inference_steps,
            guidance_scale=icfg.guidance_scale,
            sampler=icfg.sampler,
        )[0]  # [H, W, 3] in [0,1]
        images.append(img)
        segments.append(("image", img))

        # ---- close the span: <dream_end> (+ optional CLIP image span) ----
        cache, first_tok, rng = fns["tail"](
            params, cache, jnp.int32(cur_pos), img, rng
        )
        cur_pos += fns["tail_len"]

    return {"segments": segments, "images": images}
