"""HF/torch CLIPVisionModel checkpoint → dreamllm_tpu param pytree.

Covers the weights the reference loads via ``CLIPVisionModel.from_pretrained``
(modeling_plugins.py:216-230). Torch conv weight [out, in, kh, kw] → HWIO;
linear [out, in] → [in, out]; per-layer tensors stacked on axis 0 for scan.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.clip import CLIPVisionConfig


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def clip_config_from_hf(hf_config: Any, dtype=jnp.float32) -> CLIPVisionConfig:
    return CLIPVisionConfig(
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        dtype=dtype,
    )


def convert_clip_vision_state_dict(
    state_dict: Mapping[str, Any],
    cfg: CLIPVisionConfig,
    prefix: str = "vision_model.",
    dtype=None,
) -> dict:
    dtype = dtype or cfg.dtype
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    L = cfg.num_hidden_layers
    lp = prefix + "encoder.layers.{l}."

    def stack(fmt, transform=lambda x: x):
        return jnp.asarray(np.stack([transform(sd[fmt.format(l=l)]) for l in range(L)]), dtype)

    t = np.transpose
    layers = {
        "ln1_w": stack(lp + "layer_norm1.weight"),
        "ln1_b": stack(lp + "layer_norm1.bias"),
        "ln2_w": stack(lp + "layer_norm2.weight"),
        "ln2_b": stack(lp + "layer_norm2.bias"),
        "wq": stack(lp + "self_attn.q_proj.weight", t),
        "bq": stack(lp + "self_attn.q_proj.bias"),
        "wk": stack(lp + "self_attn.k_proj.weight", t),
        "bk": stack(lp + "self_attn.k_proj.bias"),
        "wv": stack(lp + "self_attn.v_proj.weight", t),
        "bv": stack(lp + "self_attn.v_proj.bias"),
        "wo": stack(lp + "self_attn.out_proj.weight", t),
        "bo": stack(lp + "self_attn.out_proj.bias"),
        "fc1_w": stack(lp + "mlp.fc1.weight", t),
        "fc1_b": stack(lp + "mlp.fc1.bias"),
        "fc2_w": stack(lp + "mlp.fc2.weight", t),
        "fc2_b": stack(lp + "mlp.fc2.bias"),
    }
    return {
        "class_embedding": jnp.asarray(sd[prefix + "embeddings.class_embedding"], dtype),
        # torch conv [out, in, kh, kw] -> HWIO [kh, kw, in, out]
        "patch_embedding": jnp.asarray(
            np.transpose(sd[prefix + "embeddings.patch_embedding.weight"], (2, 3, 1, 0)), dtype
        ),
        "position_embedding": jnp.asarray(
            sd[prefix + "embeddings.position_embedding.weight"], dtype
        ),
        "pre_ln_w": jnp.asarray(sd[prefix + "pre_layrnorm.weight"], dtype),
        "pre_ln_b": jnp.asarray(sd[prefix + "pre_layrnorm.bias"], dtype),
        "post_ln_w": jnp.asarray(sd[prefix + "post_layernorm.weight"], dtype),
        "post_ln_b": jnp.asarray(sd[prefix + "post_layernorm.bias"], dtype),
        "layers": layers,
    }


def clip_text_config_from_hf(hf_config, dtype=jnp.float32):
    from dreamllm_tpu.models.clip_text import CLIPTextConfig

    return CLIPTextConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        max_position_embeddings=hf_config.max_position_embeddings,
        layer_norm_eps=hf_config.layer_norm_eps,
        projection_dim=getattr(hf_config, "projection_dim", 512),
        dtype=dtype,
    )


def convert_clip_text_state_dict(
    state_dict: Mapping[str, Any],
    cfg,
    prefix: str = "text_model.",
    dtype=None,
) -> dict:
    """HF CLIPTextModel state dict → models/clip_text pytree (needed for the
    CLIP-select re-ranking protocol with real weights)."""
    dtype = dtype or cfg.dtype
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    L = cfg.num_hidden_layers
    lp = prefix + "encoder.layers.{l}."
    t = np.transpose

    def stack(fmt, transform=lambda x: x):
        return jnp.asarray(np.stack([transform(sd[fmt.format(l=l)]) for l in range(L)]), dtype)

    layers = {
        "ln1_w": stack(lp + "layer_norm1.weight"),
        "ln1_b": stack(lp + "layer_norm1.bias"),
        "ln2_w": stack(lp + "layer_norm2.weight"),
        "ln2_b": stack(lp + "layer_norm2.bias"),
        "wq": stack(lp + "self_attn.q_proj.weight", t),
        "bq": stack(lp + "self_attn.q_proj.bias"),
        "wk": stack(lp + "self_attn.k_proj.weight", t),
        "bk": stack(lp + "self_attn.k_proj.bias"),
        "wv": stack(lp + "self_attn.v_proj.weight", t),
        "bv": stack(lp + "self_attn.v_proj.bias"),
        "wo": stack(lp + "self_attn.out_proj.weight", t),
        "bo": stack(lp + "self_attn.out_proj.bias"),
        "fc1_w": stack(lp + "mlp.fc1.weight", t),
        "fc1_b": stack(lp + "mlp.fc1.bias"),
        "fc2_w": stack(lp + "mlp.fc2.weight", t),
        "fc2_b": stack(lp + "mlp.fc2.bias"),
    }
    return {
        "token_embedding": jnp.asarray(sd[prefix + "embeddings.token_embedding.weight"], dtype),
        "position_embedding": jnp.asarray(
            sd[prefix + "embeddings.position_embedding.weight"], dtype
        ),
        "final_ln_w": jnp.asarray(sd[prefix + "final_layer_norm.weight"], dtype),
        "final_ln_b": jnp.asarray(sd[prefix + "final_layer_norm.bias"], dtype),
        "layers": layers,
    }


def convert_clip_model_dir(path: str, dtype=None):
    """Full CLIPModel dir → (vision params, text params, visual_projection,
    text_projection, logit_scale) — everything the CLIP-select protocol needs
    (eval/text2img.py clip_score_fn)."""
    import json
    import os

    from dreamllm_tpu.convert.cli import _Attr, load_state_dict_dir

    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    sd = load_state_dict_dir(path)
    vcfg = clip_config_from_hf(_Attr(raw["vision_config"]), dtype=dtype or jnp.float32)
    tcfg = clip_text_config_from_hf(_Attr(raw["text_config"]), dtype=dtype or jnp.float32)
    vision = convert_clip_vision_state_dict(sd, vcfg, prefix="vision_model.", dtype=dtype)
    text = convert_clip_text_state_dict(sd, tcfg, prefix="text_model.", dtype=dtype)
    vproj = jnp.asarray(np.transpose(_to_np(sd["visual_projection.weight"])), dtype or jnp.float32)
    tproj = jnp.asarray(np.transpose(_to_np(sd["text_projection.weight"])), dtype or jnp.float32)
    logit_scale = jnp.asarray(_to_np(sd["logit_scale"]), jnp.float32)
    return (vcfg, vision), (tcfg, text), vproj, tproj, logit_scale
