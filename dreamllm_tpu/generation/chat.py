"""Multimodal chat API: conversation + images in, text (and images) out.

The user-facing wrapper the reference spreads across vqa_inference.py
prompt assembly and inference.py demos: render the dialog with a template,
splice images, decode — optionally routing through the interleaved
decode-then-diffuse loop so the assistant can answer WITH images.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.data.conversation import TEMPLATES, render_prompt
from dreamllm_tpu.data.dataset_types import Message
from dreamllm_tpu.generation.interleaved import InterleavedConfig, generate_interleaved
from dreamllm_tpu.generation.sampler import SamplingConfig, generate_text
from dreamllm_tpu.generation.stopping import (
    make_stop_fn,
    stops_for_template,
    truncate_at_stop,
)
from dreamllm_tpu.models.clip import clip_preprocess
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, multimodal_embed
from dreamllm_tpu.utils.errors import ClientError

IMAGE_PLACEHOLDER = "<image>"


def encode_chat_prompt(
    tokenizer,
    cfg: DreamLLMConfig,
    messages: Sequence[Message],
    images: Sequence[Any] = (),
    template: str = "vicuna_v1.1",
):
    """→ (input_ids [1,S], images [1,M,H,W,3], image_positions [1,M])."""
    st = cfg.special_tokens
    prompt = render_prompt(TEMPLATES[template], list(messages))
    parts = prompt.split(IMAGE_PLACEHOLDER)
    if len(parts) - 1 != len(images):
        raise ClientError(
            f"{len(parts) - 1} <image> placeholders but {len(images)} images"
        )
    ids: list[int] = [st.bos]
    positions: list[int] = []
    pix: list[np.ndarray] = []
    for i, part in enumerate(parts):
        if i > 0:
            positions.append(len(ids) + 1)
            ids += [st.im_start] + [st.im_patch] * cfg.image_embed_len + [st.im_end]
            raw = jnp.asarray(np.asarray(images[i - 1], np.float32))[None]
            if raw.max() > 1.5:
                raw = raw / 255.0
            pix.append(np.asarray(clip_preprocess(raw, cfg.vision.image_size)[0]))
        if part:
            ids += tokenizer.encode(part)
    arr_ids = jnp.asarray([ids], jnp.int32)
    if pix:
        return (
            arr_ids,
            jnp.asarray(np.stack(pix))[None],
            jnp.asarray([positions], jnp.int32),
        )
    return arr_ids, None, None


def chat(
    params,
    cfg: DreamLLMConfig,
    tokenizer,
    messages: Sequence[Message],
    images: Sequence[Any] = (),
    *,
    sampling: SamplingConfig | None = None,
    template: str = "vicuna_v1.1",
    head_params=None,
    head_cfg=None,
    interleaved: InterleavedConfig | None = None,
    rng: jax.Array | None = None,
) -> dict:
    """One assistant turn. Returns {"text": str, "images": [arrays]}.

    Pass ``head_params``/``head_cfg`` (+ optionally ``interleaved``) to let
    the assistant emit images via <dream_start> routing.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    ids, pix, pos = encode_chat_prompt(tokenizer, cfg, messages, images, template)

    if head_params is not None and head_cfg is not None:
        if interleaved is not None and sampling is not None:
            # per-request sampling overrides the construction-time defaults;
            # the request's token budget is honored but capped at the
            # server-configured budget (it bounds the KV-cache allocation)
            icfg = dataclasses.replace(
                interleaved,
                sampling=sampling,
                max_new_tokens=min(
                    sampling.max_new_tokens, interleaved.max_new_tokens
                ),
            )
        else:
            icfg = interleaved or InterleavedConfig(
                sampling=sampling or SamplingConfig(
                    greedy=True, eos_token_id=cfg.special_tokens.eos
                )
            )
        out = generate_interleaved(
            params, cfg, head_params, head_cfg, ids, icfg, rng,
            prompt_images=pix, prompt_image_positions=pos,
        )
        text_parts = [
            tokenizer.decode(np.asarray(t).tolist())
            for kind, t in out["segments"] if kind == "text"
        ]
        return {"text": "\n".join(text_parts), "images": out["images"]}

    scfg = sampling or SamplingConfig(greedy=True, eos_token_id=cfg.special_tokens.eos)
    embeds = multimodal_embed(params, cfg, ids, images=pix, image_positions=pos)
    out = generate_text(
        params["llm"], cfg.llm, ids,
        jnp.asarray([ids.shape[1]], jnp.int32), scfg, rng,
        inputs_embeds=embeds,
    )
    n = int(out["lengths"][0])
    return {"text": tokenizer.decode(np.asarray(out["tokens"][0, :n]).tolist()),
            "images": []}


def make_chat_fn(
    params,
    cfg: DreamLLMConfig,
    tokenizer,
    *,
    head_params=None,
    head_cfg=None,
    template: str = "vicuna_v1.1",
    interleaved: InterleavedConfig | None = None,
    max_new_tokens_limit: int = 1024,
    engine=None,
):
    """Close over model state → the ``ModelServer(chat_fn=...)`` contract:

        (messages: list[dict], images: list[HWC arrays], req: dict)
        → {"text": str, "images": [float arrays]}

    ``req`` carries the per-request knobs from the JSON body
    (max_new_tokens / greedy / temperature / top_k / top_p / seed /
    template); sampling values are range-checked before they reach the
    compiled sampler. This is the multimodal serving entry the reference
    never shipped (its serve shim is text-only, language_eval tools/serve).

    ``engine=`` routes decode through a ``ContinuousBatchingEngine`` via its
    embeds-prompt lanes (``submit(prompt_embeds=...)``): concurrent chat
    requests batch together mid-decode instead of serializing under the
    server lock (the returned chat_fn is marked ``concurrent``). The engine
    must share the LLM weights the embeddings are computed from. Text-out
    only — image OUTPUT (``head_params``) needs the interleaved driver and
    keeps the locked path.
    """
    from dreamllm_tpu.generation.sampler import validate_sampling

    if engine is not None and head_params is not None:
        raise ValueError(
            "engine-routed chat is text-out only; image output "
            "(head_params) requires the locked interleaved path"
        )
    if engine is not None and not engine.running:
        # compile the embeds prefill (and the rest) NOW by executing each
        # program once: the engine's scheduler thread is the only
        # dispatcher, and a lazy first-use compile of the multimodal
        # prefill would freeze every live decode lane for the full
        # (remote) compile. Skipped if the engine is already serving
        # (warmup rewrites engine state, racy once the scheduler runs).
        engine.warmup(embeds=True)

    def chat_fn(messages, images, req: dict) -> dict:
        msgs = [
            m if isinstance(m, Message)
            else Message(m["role"], m.get("content", ""))
            for m in messages
        ]
        explicit = any(k in req for k in ("temperature", "top_k", "top_p"))
        greedy = bool(req.get("greedy", not explicit))
        temperature = float(req.get("temperature", 1.0))
        top_k = int(req.get("top_k", 0))
        top_p = float(req.get("top_p", 1.0))
        validate_sampling(temperature, top_k, top_p)
        # max_new_tokens sizes the KV cache and token buffers — an
        # unbounded client value would OOM the chip, so clamp to the
        # server-configured limit and reject nonsense
        mnt = int(req.get("max_new_tokens", 128))
        if not 1 <= mnt <= max_new_tokens_limit:
            raise ClientError(
                f"max_new_tokens must be in [1, {max_new_tokens_limit}], got {mnt}"
            )
        tmpl = str(req.get("template", template))
        if tmpl not in TEMPLATES:
            raise ClientError(
                f"unknown template {tmpl!r}; available: {sorted(TEMPLATES)}"
            )
        # conversation-separator stopping: templates whose separator is not
        # EOS (vicuna_v0's "###") stop device-side when the separator is a
        # single token, host-side at chunk boundaries otherwise; the decoded
        # reply is truncated at the separator either way
        # (reference: KeywordsStoppingCriteria + strip, vqa_inference.py)
        stop_strings, halt_ids = stops_for_template(
            TEMPLATES[tmpl], tokenizer, eos_id=cfg.special_tokens.eos
        )
        if engine is not None:
            ids, pix, pos = encode_chat_prompt(tokenizer, cfg, msgs, images, tmpl)
            kw = dict(max_new_tokens=mnt, greedy=greedy,
                      temperature=temperature, top_k=top_k, top_p=top_p,
                      seed=int(req["seed"]) if "seed" in req else None,
                      stop_token_ids=halt_ids,
                      stop_fn=make_stop_fn(tokenizer, stop_strings,
                                           exclude_ids=halt_ids))
            if pix is None:
                # text-only turns ride the token-id lanes: they keep the
                # engine's prompt-prefix cache (keys are token tuples) and
                # ship S ints instead of S×H floats
                out_ids = engine.submit(np.asarray(ids[0]).tolist(), **kw)
            else:
                # embeds stay on device — multimodal_embed's output feeds
                # the engine's embeds prefill without a host round-trip
                embeds = multimodal_embed(params, cfg, ids,
                                          images=pix, image_positions=pos)
                out_ids = engine.submit(prompt_embeds=embeds[0], **kw)
            # no .strip(): the locked chat() path below doesn't strip either,
            # and the two must return identical text for identical requests
            text = tokenizer.decode(out_ids)
            if stop_strings:
                text = truncate_at_stop(text, stop_strings)
            return {"text": text, "images": []}
        scfg = SamplingConfig(
            greedy=greedy, temperature=temperature, top_k=top_k, top_p=top_p,
            max_new_tokens=mnt,
            eos_token_id=cfg.special_tokens.eos,
            halt_tokens=halt_ids,
        )
        out = chat(
            params, cfg, tokenizer, msgs, images,
            sampling=scfg, template=tmpl,
            head_params=head_params, head_cfg=head_cfg,
            interleaved=interleaved,
            rng=jax.random.PRNGKey(int(req.get("seed", 0))),
        )
        if stop_strings:
            out = dict(out, text=truncate_at_stop(out["text"], stop_strings))
        return out

    # the engine serializes device access itself; concurrent handler threads
    # may enter (their embed computations are independent dispatches)
    chat_fn.concurrent = engine is not None
    return chat_fn
