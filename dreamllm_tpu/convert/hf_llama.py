"""HF/torch LLaMA checkpoint → dreamllm_tpu param pytree.

Replaces the reference's reliance on ``transformers.from_pretrained``
(modeling_dreamllm.py:1244-1333) with an explicit, testable mapping. The
converter takes a *state dict of numpy arrays* so it works with torch
state_dicts, safetensors files, or anything array-like — no torch dependency
inside the framework itself.

Layout notes:
  * torch ``nn.Linear`` weights are ``[out, in]``; ours are ``[in, out]``
    (``y = x @ W``) — transposed here once at conversion time.
  * per-layer tensors are stacked along a leading ``L`` axis for
    ``lax.scan`` (models/llama.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.llama import LlamaConfig


def _to_np(x) -> np.ndarray:
    """Accept torch tensors / numpy arrays / anything with __array__."""
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def llama_config_from_hf(hf_config: Any, dtype=jnp.float32) -> LlamaConfig:
    """Build a LlamaConfig from a transformers LlamaConfig-like object."""
    rs = getattr(hf_config, "rope_scaling", None) or {}
    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        num_key_value_heads=getattr(hf_config, "num_key_value_heads", None),
        max_position_embeddings=hf_config.max_position_embeddings,
        rms_norm_eps=hf_config.rms_norm_eps,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rope_scaling_type=rs.get("type", rs.get("rope_type", "none")) or "none",
        rope_scaling_factor=rs.get("factor", 1.0),
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        dtype=dtype,
    )


def convert_llama_state_dict(
    state_dict: Mapping[str, Any],
    cfg: LlamaConfig,
    prefix: str = "model.",
    dtype=None,
) -> dict:
    """Map an HF LLaMA state dict to our stacked-scan param pytree."""
    dtype = dtype or cfg.dtype
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    L = cfg.num_hidden_layers

    def layer_stack(fmt: str, transform: Callable[[np.ndarray], np.ndarray]):
        return jnp.asarray(
            np.stack([transform(sd[fmt.format(l=l)]) for l in range(L)]), dtype
        )

    t = np.transpose  # [out,in] -> [in,out]
    layers = {
        "input_norm": layer_stack(prefix + "layers.{l}.input_layernorm.weight", lambda x: x),
        "post_attn_norm": layer_stack(
            prefix + "layers.{l}.post_attention_layernorm.weight", lambda x: x
        ),
        "wq": layer_stack(prefix + "layers.{l}.self_attn.q_proj.weight", t),
        "wk": layer_stack(prefix + "layers.{l}.self_attn.k_proj.weight", t),
        "wv": layer_stack(prefix + "layers.{l}.self_attn.v_proj.weight", t),
        "wo": layer_stack(prefix + "layers.{l}.self_attn.o_proj.weight", t),
        "w_gate": layer_stack(prefix + "layers.{l}.mlp.gate_proj.weight", t),
        "w_up": layer_stack(prefix + "layers.{l}.mlp.up_proj.weight", t),
        "w_down": layer_stack(prefix + "layers.{l}.mlp.down_proj.weight", t),
    }
    params = {
        "embed_tokens": jnp.asarray(sd[prefix + "embed_tokens.weight"], dtype),
        "layers": layers,
        "final_norm": jnp.asarray(sd[prefix + "norm.weight"], dtype),
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(t(sd["lm_head.weight"]), dtype)
    return params


def resize_vocab_with_mean_init(
    params: dict,
    cfg: LlamaConfig,
    new_vocab_size: int,
    dtype=None,
) -> tuple[dict, LlamaConfig]:
    """Grow ``embed_tokens``/``lm_head`` to ``new_vocab_size``, initializing
    every NEW token row to the mean of the existing embeddings.

    The canonical cold start: a stock 32,000-vocab Vicuna checkpoint → the
    framework's 32,064-vocab configs (7 multimodal special tokens + pad).
    Mirrors the reference's tokenizer-aware ``resize_token_embeddings``
    (modeling_dreamllm.py:1310-1322) followed by
    ``average_init_token_embeddings`` (tokenizer_utils.py:70-80, called from
    projects/dreamllm/train.py:142-147).
    """
    emb = np.asarray(params["embed_tokens"], np.float32)
    old = emb.shape[0]
    if new_vocab_size < old:
        raise ValueError(
            f"cannot shrink vocab {old} -> {new_vocab_size}; the reference "
            "only warns on this, but silently dropping token rows loses "
            "trained embeddings"
        )
    if new_vocab_size == old and cfg.vocab_size == old:
        return params, cfg
    dtype = dtype or params["embed_tokens"].dtype
    n_new = new_vocab_size - old
    out = dict(params)
    if n_new > 0:
        new_rows = np.tile(emb.mean(axis=0, keepdims=True), (n_new, 1))
        out["embed_tokens"] = jnp.asarray(
            np.concatenate([emb, new_rows], axis=0), dtype
        )
        if "lm_head" in params:  # ours is [H, V] (y = x @ W)
            head = np.asarray(params["lm_head"], np.float32)
            new_cols = np.tile(head.mean(axis=1, keepdims=True), (1, n_new))
            out["lm_head"] = jnp.asarray(
                np.concatenate([head, new_cols], axis=1), dtype
            )
    return out, dataclasses.replace(cfg, vocab_size=new_vocab_size)
