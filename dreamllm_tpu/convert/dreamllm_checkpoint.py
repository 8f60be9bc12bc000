"""Converter for trained reference (Omni/DreamLLM) checkpoints.

A reference run dir contains (projects/dreamllm/README.md:21, plugin
save_model, modeling_plugins.py:167-169/:293-295/:447-449):

    pytorch_model*.bin / *.safetensors   — LLM ("model."-prefixed LLaMA keys)
    config.json                          — DreamLLMConfig (LLaMA hyperparams)
    dream_embedding.bin                  — {"dream_queries": [1, 64, H]}
    clip_vision_embedding.bin            — "clip_vision_model.vision_model.*"
                                           + "projector.projector.*"
    stable_diffusion_head.bin            — "unet.*", "vae.*",
                                           "projector.projector.*"

This module maps all of it into this framework's pytrees and writes one
orbax checkpoint — the complete switching path for users with trained
reference models.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.utils.logging import get_logger

logger = get_logger("dreamllm_tpu.convert")


def _to_np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _subdict(sd: Mapping, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_reference_projector(sd: Mapping[str, Any], dtype=jnp.float32) -> dict:
    """reference BaseProjector state dict → our projector pytree.

    Linear: "projector.weight"/"projector.bias"; MLP: Sequential indices
    "projector.0.weight", "projector.2.weight", ... (GELUs at odd slots).
    """
    sd = {k: _to_np(v) for k, v in sd.items()}
    if "projector.weight" in sd:
        layer = {"w": jnp.asarray(sd["projector.weight"].T, dtype)}
        layer["b"] = jnp.asarray(
            sd.get("projector.bias", np.zeros(sd["projector.weight"].shape[0])), dtype
        )
        return {"layers": [layer]}
    layers = []
    i = 0
    while f"projector.{i}.weight" in sd:
        w = sd[f"projector.{i}.weight"]
        b = sd.get(f"projector.{i}.bias", np.zeros(w.shape[0]))
        layers.append({"w": jnp.asarray(w.T, dtype), "b": jnp.asarray(b, dtype)})
        i += 2  # skip the GELU slots
    if not layers:
        raise KeyError(f"no projector weights among {sorted(sd)[:8]}")
    return {"layers": layers}


def convert_dream_embedding_bin(sd: Mapping[str, Any], dtype=jnp.float32) -> dict:
    q = _to_np(sd["dream_queries"])  # [1, N, H]
    return {"queries": jnp.asarray(q[0], dtype)}


def convert_clip_embedding_bin(sd: Mapping[str, Any], clip_cfg, dtype=jnp.float32) -> dict:
    from dreamllm_tpu.convert.hf_clip import convert_clip_vision_state_dict

    clip_sd = _subdict(sd, "clip_vision_model.")
    proj_sd = _subdict(sd, "projector.")
    return {
        "clip": convert_clip_vision_state_dict(
            clip_sd, clip_cfg, prefix="vision_model.", dtype=dtype
        ),
        "projector": convert_reference_projector(proj_sd, dtype),
    }


def convert_sd_head_bin(sd: Mapping[str, Any], unet_cfg, vae_cfg, dtype=jnp.float32) -> dict:
    from dreamllm_tpu.convert.hf_sd import convert_unet_state_dict, convert_vae_state_dict

    return {
        "unet": convert_unet_state_dict(_subdict(sd, "unet."), unet_cfg, dtype),
        "vae": convert_vae_state_dict(_subdict(sd, "vae."), vae_cfg, dtype),
        "projector": convert_reference_projector(_subdict(sd, "projector."), dtype),
    }


def _load_torch_bin(path: str) -> dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def convert_reference_run_dir(
    run_dir: str,
    *,
    clip_cfg=None,
    unet_cfg=None,
    vae_cfg=None,
    out_dir: str | None = None,
    dtype=jnp.bfloat16,
) -> dict:
    """Convert a full reference checkpoint directory. Returns the param dict
    (and writes an orbax checkpoint when ``out_dir`` is given). Configs
    default to the standard DreamLLM-7B recipe (CLIP-L/14, SD-2.1)."""
    from dreamllm_tpu.convert.cli import convert_llama_dir
    from dreamllm_tpu.models.clip import CLIPVisionConfig
    from dreamllm_tpu.models.sd.unet import UNetConfig
    from dreamllm_tpu.models.sd.vae import VAEConfig

    clip_cfg = clip_cfg or CLIPVisionConfig(dtype=dtype)
    unet_cfg = unet_cfg or UNetConfig(dtype=dtype)
    vae_cfg = vae_cfg or VAEConfig(dtype=dtype)

    params: dict = {}
    _, params["llm"] = convert_llama_dir(run_dir, dtype)
    logger.info("converted LLM from %s", run_dir)

    p = os.path.join(run_dir, "clip_vision_embedding.bin")
    if os.path.exists(p):
        params["clip_vision_embedding"] = convert_clip_embedding_bin(
            _load_torch_bin(p), clip_cfg, dtype
        )
        logger.info("converted clip_vision_embedding.bin")
    p = os.path.join(run_dir, "dream_embedding.bin")
    if os.path.exists(p):
        params["dream_embedding"] = convert_dream_embedding_bin(_load_torch_bin(p), dtype)
        logger.info("converted dream_embedding.bin")
    p = os.path.join(run_dir, "stable_diffusion_head.bin")
    if os.path.exists(p):
        params["sd_head"] = convert_sd_head_bin(_load_torch_bin(p), unet_cfg, vae_cfg, dtype)
        logger.info("converted stable_diffusion_head.bin")

    if out_dir:
        from dreamllm_tpu.train.checkpoints import save_checkpoint

        path = save_checkpoint(out_dir, 0, params, extra_meta={"source": run_dir})
        logger.info("wrote %s", path)
    return params
