"""NLP evaluation: log-prob scoring for multiple-choice + perplexity.

TPU-native equivalent of the reference's language-eval core
(omni/eval/language_eval/ — llama_evaluation's local evaluator scoring
options by logprob; the fairscale-MP model wrapper becomes our pjit model).
Covers the multich-style tasks (BoolQ/PIQA/HellaSwag/MMLU/...): score each
candidate continuation's total logprob given the context, pick argmax.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.llama import LlamaConfig, llama_forward, llama_logits


def sequence_logprob(
    params,
    cfg: LlamaConfig,
    ids: jnp.ndarray,          # [B, S] padded
    target_start: jnp.ndarray,  # [B] index where the continuation begins
    lengths: jnp.ndarray,       # [B] total real length
    *,
    normalize_by_length: bool = False,
) -> jnp.ndarray:
    """Total (or mean) logprob of ids[target_start:length] given the prefix."""
    b, s = ids.shape
    seg = (jnp.arange(s)[None] < lengths[:, None]).astype(jnp.int32)
    out = llama_forward(params, cfg, input_ids=ids, segment_ids=seg)
    logits = llama_logits(params, cfg, out["last_hidden_state"])
    logp = jax.nn.log_softmax(logits, axis=-1)
    # token t is predicted by position t-1
    tok_lp = jnp.take_along_axis(logp[:, :-1], ids[:, 1:, None], axis=-1)[..., 0]
    pos = jnp.arange(1, s)[None]
    mask = (pos >= target_start[:, None]) & (pos < lengths[:, None])
    total = jnp.sum(tok_lp * mask, axis=-1)
    if normalize_by_length:
        total = total / jnp.maximum(jnp.sum(mask, axis=-1), 1)
    return total


def choice_logprobs(
    params,
    cfg: LlamaConfig,
    tokenizer,
    context: str,
    choices: Sequence[str],
    *,
    bos: int = 1,
    normalize_by_length: bool = False,
) -> np.ndarray:
    """Per-choice continuation logprob vector (summed, or per-TOKEN mean with
    ``normalize_by_length``)."""
    ctx_ids = [bos] + tokenizer.encode(context)
    rows, starts, lengths = [], [], []
    for c in choices:
        cont = tokenizer.encode(c)
        rows.append(ctx_ids + cont)
        starts.append(len(ctx_ids))
        lengths.append(len(ctx_ids) + len(cont))
    s = max(lengths)
    ids = np.zeros((len(rows), s), np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
    lp = sequence_logprob(
        params, cfg, jnp.asarray(ids), jnp.asarray(starts), jnp.asarray(lengths),
        normalize_by_length=normalize_by_length,
    )
    return np.asarray(lp)


def multiple_choice(
    params,
    cfg: LlamaConfig,
    tokenizer,
    context: str,
    choices: Sequence[str],
    *,
    bos: int = 1,
    normalize_by_length: bool = True,
) -> int:
    """Argmax-logprob choice (MMLU/HellaSwag-style)."""
    lp = choice_logprobs(
        params, cfg, tokenizer, context, choices, bos=bos,
        normalize_by_length=normalize_by_length,
    )
    return int(np.argmax(lp))


def perplexity(params, cfg: LlamaConfig, ids: jnp.ndarray, lengths: jnp.ndarray) -> float:
    """Corpus perplexity over padded [B, S] ids."""
    lp = sequence_logprob(
        params, cfg, ids, jnp.ones((ids.shape[0],), jnp.int32), lengths
    )
    n_tokens = jnp.sum(jnp.maximum(lengths - 1, 0))
    return float(jnp.exp(-jnp.sum(lp) / jnp.maximum(n_tokens, 1)))
