"""CLIP text encoder + dual-tower similarity scoring.

Needed for the reference's CLIP-select evaluation step — 8 seeds per caption,
pick the image with max ``logits_per_image``
(omni/eval/text2img/ddp_sample_coco.py:351-386 drives HF ``CLIPModel``).

Architecture (HF CLIPTextModel): token+position embeddings → causal pre-LN
transformer (quick-gelu) → final layer norm; the pooled embedding is the
hidden state at each sequence's EOT position (highest token id, HF
convention). ``clip_similarity`` adds the text/visual projections +
logit_scale of the full CLIPModel.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.ops.activations import quick_gelu
from dreamllm_tpu.ops.attention import dot_product_attention
from dreamllm_tpu.ops.norms import layer_norm

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768
    dtype: Any = jnp.float32


def init_clip_text_params(rng: jax.Array, cfg: CLIPTextConfig) -> Params:
    h, i, d, L = cfg.hidden_size, cfg.intermediate_size, cfg.dtype, cfg.num_hidden_layers
    k = jax.random.split(rng, 10)

    def dense(key, shape, scale=None):
        scale = scale if scale is not None else shape[0] ** -0.5
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(d)

    def stack(key, shape):
        return jnp.stack([dense(kk, shape) for kk in jax.random.split(key, L)])

    layers = {
        "ln1_w": jnp.ones((L, h), d), "ln1_b": jnp.zeros((L, h), d),
        "ln2_w": jnp.ones((L, h), d), "ln2_b": jnp.zeros((L, h), d),
        "wq": stack(k[0], (h, h)), "bq": jnp.zeros((L, h), d),
        "wk": stack(k[1], (h, h)), "bk": jnp.zeros((L, h), d),
        "wv": stack(k[2], (h, h)), "bv": jnp.zeros((L, h), d),
        "wo": stack(k[3], (h, h)), "bo": jnp.zeros((L, h), d),
        "fc1_w": stack(k[4], (h, i)), "fc1_b": jnp.zeros((L, i), d),
        "fc2_w": stack(k[5], (i, h)), "fc2_b": jnp.zeros((L, h), d),
    }
    return {
        "token_embedding": dense(k[6], (cfg.vocab_size, h), 0.02),
        "position_embedding": dense(k[7], (cfg.max_position_embeddings, h), 0.02),
        "final_ln_w": jnp.ones((h,), d),
        "final_ln_b": jnp.zeros((h,), d),
        "layers": layers,
    }


def clip_text_forward(params: Params, cfg: CLIPTextConfig, input_ids: jnp.ndarray):
    """→ (last_hidden [B,S,H], pooled [B,H] at the EOT position)."""
    b, s = input_ids.shape
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["position_embedding"][None, :s].astype(x.dtype)

    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh
    eps = cfg.layer_norm_eps

    def block(x, layer):
        y = layer_norm(x, layer["ln1_w"], layer["ln1_b"], eps)
        q = (y @ layer["wq"] + layer["bq"]).reshape(b, s, nh, hd)
        k = (y @ layer["wk"] + layer["bk"]).reshape(b, s, nh, hd)
        v = (y @ layer["wv"] + layer["bv"]).reshape(b, s, nh, hd)
        a = dot_product_attention(q, k, v, causal=True).reshape(b, s, cfg.hidden_size)
        x = x + (a @ layer["wo"] + layer["bo"])
        y = layer_norm(x, layer["ln2_w"], layer["ln2_b"], eps)
        y = quick_gelu(y @ layer["fc1_w"] + layer["fc1_b"]) @ layer["fc2_w"] + layer["fc2_b"]
        return x + y, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    x = layer_norm(x, params["final_ln_w"], params["final_ln_b"], eps)
    # EOT pooling: HF takes argmax of token ids (EOT has the highest id)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(b), eot]
    return x, pooled


def clip_similarity(
    image_embeds: jnp.ndarray,   # [Ni, H_vision] pooled CLS (clip_pooled_output)
    text_embeds: jnp.ndarray,    # [Nt, H_text] pooled EOT
    visual_projection: jnp.ndarray,  # [H_vision, proj]
    text_projection: jnp.ndarray,    # [H_text, proj]
    logit_scale: jnp.ndarray | float = 100.0,
):
    """logits_per_image [Ni, Nt] — HF CLIPModel similarity."""
    ie = image_embeds @ visual_projection
    te = text_embeds @ text_projection
    ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    scale = jnp.exp(logit_scale) if isinstance(logit_scale, jnp.ndarray) else logit_scale
    return scale * ie @ te.T
