"""Checkpoint conversion CLI: HF/diffusers directories → one framework
checkpoint.

The switching-user path (reference users have HF LLaMA/Vicuna + CLIP +
diffusers SD checkpoints on disk): assemble them into this framework's
orbax plugin-split layout in one command.

    python -m dreamllm_tpu.convert.cli \
        --llm /path/vicuna-7b --clip /path/clip-vit-large-patch14 \
        --sd /path/stable-diffusion-2-1-base --out ./ckpts/assembled

Any component may be omitted (it gets a random init sized from the config).
Reads .safetensors or .bin shards without instantiating torch models.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.utils.logging import get_logger

logger = get_logger("dreamllm_tpu.convert")


def load_state_dict_dir(path: str) -> dict[str, np.ndarray]:
    """Load all .safetensors / .bin weight shards under ``path``."""
    sd: dict[str, Any] = {}
    sts = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if sts:
        from safetensors.numpy import load_file

        for f in sts:
            sd.update(load_file(f))
        return sd
    bins = sorted(glob.glob(os.path.join(path, "*.bin"))) + sorted(
        glob.glob(os.path.join(path, "*.pth"))
    )
    if bins:
        import torch

        for f in bins:
            part = torch.load(f, map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() for k, v in part.items()})
        return sd
    raise FileNotFoundError(f"no .safetensors/.bin under {path}")


def _load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


class _Attr:
    """dict → attribute access (duck-types an HF config object)."""

    def __init__(self, d: dict):
        self.__dict__.update(d)

    def __getattr__(self, k):
        raise AttributeError(k)


def convert_llama_dir(path: str, dtype=None, vocab_size: int | None = None):
    """``vocab_size``: grow the embedding/lm_head to this size with
    mean-of-existing-rows init (stock 32,000-vocab Vicuna → 32,064-vocab
    DreamLLM configs; reference modeling_dreamllm.py:1310-1322 +
    projects/dreamllm/train.py:142-147)."""
    from dreamllm_tpu.convert.hf_llama import (
        convert_llama_state_dict,
        llama_config_from_hf,
        resize_vocab_with_mean_init,
    )
    import jax.numpy as jnp

    raw = _load_json(os.path.join(path, "config.json"))
    raw.setdefault("num_key_value_heads", raw.get("num_attention_heads"))
    raw.setdefault("rope_theta", 10000.0)
    raw.setdefault("rms_norm_eps", raw.get("layer_norm_eps", 1e-6))
    raw.setdefault("tie_word_embeddings", False)
    raw.setdefault("rope_scaling", None)
    cfg = llama_config_from_hf(_Attr(raw), dtype=dtype or jnp.bfloat16)
    sd = load_state_dict_dir(path)
    params = convert_llama_state_dict(sd, cfg)
    if vocab_size is not None and vocab_size != cfg.vocab_size:
        params, cfg = resize_vocab_with_mean_init(params, cfg, vocab_size)
        logger.info("resized vocab to %d with mean-init rows", vocab_size)
    return cfg, params


def convert_clip_dir(path: str, dtype=None):
    from dreamllm_tpu.convert.hf_clip import clip_config_from_hf, convert_clip_vision_state_dict
    import jax.numpy as jnp

    raw = _load_json(os.path.join(path, "config.json"))
    if "vision_config" in raw:  # full CLIPModel config
        raw = raw["vision_config"]
        raw.setdefault("hidden_size", 1024)
    cfg = clip_config_from_hf(_Attr(raw), dtype=dtype or jnp.bfloat16)
    sd = load_state_dict_dir(path)
    # CLIPVisionModel checkpoints prefix "vision_model."; CLIPModel adds nothing extra
    prefix = "vision_model."
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    return cfg, convert_clip_vision_state_dict(sd, cfg, prefix=prefix)


def convert_sd_dir(path: str, dtype=None):
    """diffusers pipeline dir: unet/ + vae/ subfolders."""
    from dreamllm_tpu.convert.hf_sd import convert_unet_state_dict, convert_vae_state_dict
    from dreamllm_tpu.models.sd.unet import UNetConfig
    from dreamllm_tpu.models.sd.vae import VAEConfig
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    ucfg_raw = _load_json(os.path.join(path, "unet", "config.json"))
    ucfg = UNetConfig(
        sample_size=ucfg_raw.get("sample_size", 64),
        in_channels=ucfg_raw.get("in_channels", 4),
        out_channels=ucfg_raw.get("out_channels", 4),
        block_out_channels=tuple(ucfg_raw["block_out_channels"]),
        down_block_types=tuple(ucfg_raw["down_block_types"]),
        up_block_types=tuple(ucfg_raw["up_block_types"]),
        layers_per_block=ucfg_raw.get("layers_per_block", 2),
        transformer_layers_per_block=tuple(
            ucfg_raw.get("transformer_layers_per_block", [1] * len(ucfg_raw["block_out_channels"]))
            if isinstance(ucfg_raw.get("transformer_layers_per_block", 1), list)
            else [ucfg_raw.get("transformer_layers_per_block", 1)] * len(ucfg_raw["block_out_channels"])
        ),
        num_attention_heads=tuple(
            ucfg_raw["attention_head_dim"]
            if isinstance(ucfg_raw.get("attention_head_dim"), list)
            else [ucfg_raw.get("attention_head_dim", 8)] * len(ucfg_raw["block_out_channels"])
        ),
        cross_attention_dim=ucfg_raw.get("cross_attention_dim", 1024),
        addition_embed_type=ucfg_raw.get("addition_embed_type"),
        addition_time_embed_dim=ucfg_raw.get("addition_time_embed_dim", 256),
        projection_class_embeddings_input_dim=ucfg_raw.get(
            "projection_class_embeddings_input_dim", 2816
        ) or 2816,
        dtype=dtype,
    )
    vcfg_raw = _load_json(os.path.join(path, "vae", "config.json"))
    vcfg = VAEConfig(
        block_out_channels=tuple(vcfg_raw.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=vcfg_raw.get("layers_per_block", 2),
        latent_channels=vcfg_raw.get("latent_channels", 4),
        scaling_factor=vcfg_raw.get("scaling_factor", 0.18215),
        dtype=dtype,
    )
    unet = convert_unet_state_dict(load_state_dict_dir(os.path.join(path, "unet")), ucfg)
    vae = convert_vae_state_dict(load_state_dict_dir(os.path.join(path, "vae")), vcfg)
    return (ucfg, vcfg), {"unet": unet, "vae": vae}


def _quantize_llm_host(p: dict, mode: str) -> dict:
    """Serving quantization on the HOST, leaf by leaf: a 13B bf16 tree is
    26 GB — int4-quantizing at conversion time means the device only ever
    sees the packed weights (the on-device path needs the bf16 copy first)."""
    from dreamllm_tpu.ops.quant import quantize_int8
    from dreamllm_tpu.ops.quant4 import quantize_int4

    quant = quantize_int4 if mode == "int4" else quantize_int8
    cpu = jax.devices("cpu")[0]

    def q(w):
        if mode == "int4" and w.shape[-2] % 256 != 0:
            # int4 groups need K % 256 (two 128-row halves); leave odd
            # shapes (tiny models, unusual projections) unquantized
            logger.warning("skipping int4 for K=%d weight", w.shape[-2])
            return w
        # pin to the CPU backend: a bare jnp.asarray would put the full bf16
        # leaf (5.7 GB for 13B's stacked MLP) on the accelerator — exactly
        # the resident-copy problem conversion-time quantization avoids
        with jax.default_device(cpu):
            return jax.tree.map(np.asarray, quant(jnp.asarray(w)))

    layers = dict(p["layers"])
    for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
              "wqkv", "w_gate_up"):
        if k in layers:
            layers[k] = q(layers[k])
    out = dict(p, layers=layers)
    if "lm_head" in p:
        out["lm_head"] = q(p["lm_head"])
    return out


def assemble(out_dir: str, llm: str | None, clip: str | None, sd: str | None,
             dtype=None, vocab_size: int | None = None,
             quantize: str | None = None) -> str:
    """Convert + save as checkpoint-000000 under ``out_dir``."""
    from dreamllm_tpu.train.checkpoints import save_checkpoint

    params: dict = {}
    meta: dict = {}
    if llm:
        cfg, p = convert_llama_dir(llm, dtype, vocab_size=vocab_size)
        if quantize:
            p = _quantize_llm_host(p, quantize)
            logger.info("quantized LLM weights to %s", quantize)
        params["llm"] = p
        meta["llm_config"] = cfg.__dict__ | {"dtype": str(cfg.dtype)}
        logger.info("converted LLM from %s (%d tensors)", llm, len(list(_leaves(p))))
    if clip:
        cfg, p = convert_clip_dir(clip, dtype)
        params["clip_vision_embedding"] = {"clip": p}
        meta["clip_config"] = cfg.__dict__ | {"dtype": str(cfg.dtype)}
        logger.info("converted CLIP from %s", clip)
    if sd:
        cfgs, p = convert_sd_dir(sd, dtype)
        params["sd_head"] = p
        logger.info("converted SD from %s", sd)
    path = save_checkpoint(out_dir, 0, params, extra_meta={"source": {
        "llm": llm, "clip": clip, "sd": sd}})
    logger.info("assembled checkpoint at %s", path)
    return path


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--llm", default=None, help="HF LLaMA/Vicuna dir")
    p.add_argument("--clip", default=None, help="HF CLIP(Vision)Model dir")
    p.add_argument("--sd", default=None, help="diffusers pipeline dir (unet/ vae/)")
    p.add_argument("--out", required=True)
    p.add_argument("--vocab_size", type=int, default=None,
                   help="grow LLM vocab to this size with mean-init rows "
                        "(e.g. 32064 for the DreamLLM special tokens)")
    p.add_argument("--quantize", choices=("int8", "int4"), default=None,
                   help="quantize LLM matmul weights at conversion time "
                        "(host-side; int4 fits 13B on one 16 GB chip)")
    args = p.parse_args(argv)
    assemble(args.out, args.llm, args.clip, args.sd,
             vocab_size=args.vocab_size, quantize=args.quantize)


if __name__ == "__main__":
    main()
