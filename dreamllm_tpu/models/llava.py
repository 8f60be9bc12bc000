"""LLaVA variant: the same decoder + CLIP-embedding plugin, comprehension
only — demonstrating the framework's "new MLLM in a folder" extension story.

The reference clones the whole decoder into `omni/models/llava/`
(modeling_llava.py:65-791, 2.4k LoC) because plugins are baked into the
model class. Here a variant is *configuration*: a DreamLLMConfig with no
dream queries / diffusion head and ``loss_weight_vm=0``. This file is the
entire LLaVA "folder" (reference §2.4), plus its trainer specialization
(llava_trainer.py) which reduces to a freeze preset.
"""

from __future__ import annotations

import dataclasses

import jax

from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import (
    DreamLLMConfig,
    SpecialTokens,
    dreamllm_forward,
    init_dreamllm_params,
)
from dreamllm_tpu.models.llama import LlamaConfig
from dreamllm_tpu.models.projector import ProjectorConfig


def llava_config(
    llm: LlamaConfig | None = None,
    vision: CLIPVisionConfig | None = None,
    projector_type: str = "mlp",
    projector_depth: int = 2,
    frozen: tuple[str, ...] = ("clip_vision_embedding/clip",),
    special_tokens: SpecialTokens | None = None,
) -> DreamLLMConfig:
    """LLaVA-1.5-style recipe: CLIP-ViT-L/14-336 → 2-layer MLP projector →
    Vicuna decoder; no creation path."""
    llm = llm or LlamaConfig()
    vision = vision or CLIPVisionConfig(image_size=336, patch_size=14)
    return DreamLLMConfig(
        llm=llm,
        vision=vision,
        vision_projector=ProjectorConfig(
            projector_type=projector_type,
            in_dim=vision.hidden_size,
            out_dim=llm.hidden_size,
            depth=projector_depth,
        ),
        special_tokens=special_tokens or SpecialTokens(),
        n_dream_queries=0,
        image_embed_len=(vision.image_size // vision.patch_size) ** 2,
        loss_weight_vm=0.0,
        frozen=frozen,
    )


def init_llava_params(rng: jax.Array, cfg: DreamLLMConfig) -> dict:
    """Param pytree without the dream/diffusion plugins."""
    params = init_dreamllm_params(rng, cfg)
    params.pop("dream_embedding", None)
    return params


def llava_forward(params, cfg: DreamLLMConfig, batch, **kw):
    """LM-only joint forward (comprehension path of dreamllm_forward)."""
    return dreamllm_forward(params, cfg, batch, head_loss_fn=None, **kw)


# training-stage freeze presets (reference projects/llava configs):
#   pretrain: train projector only; sft: unfreeze the LLM too
LLAVA_PRETRAIN_FROZEN = ("clip_vision_embedding/clip", "llm")


def llava_pretrain_config(**kw) -> DreamLLMConfig:
    cfg = llava_config(**kw)
    return dataclasses.replace(cfg, frozen=LLAVA_PRETRAIN_FROZEN)
