"""DreamLLM inference entry point: text→image and interleaved generation.

TPU-native equivalent of projects/dreamllm/inference.py:91-116 (batch t2i via
stable_diffusion_pipeline with positive/negative prompt engineering) plus the
interleaved document demo the reference never shipped.

    python -m projects.dreamllm.inference --config_file .../smoke.py \
        prompt="a photo of a corgi" mode="t2i"
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.config import LazyArgumentParser, default_setup
from dreamllm_tpu.generation import InterleavedConfig, SamplingConfig, generate_interleaved
from dreamllm_tpu.models.dreamllm import (
    extract_dream_hidden,
    unconditional_dream_hidden,
)
from dreamllm_tpu.models.llama import llama_forward
from dreamllm_tpu.models.sd.head import sd_head_pipeline
from dreamllm_tpu.train.checkpoints import latest_checkpoint, load_params
from dreamllm_tpu.utils.logging import get_logger

from projects.dreamllm.train import build_model_cfg, make_tokenizer

logger = get_logger("projects.dreamllm.inference")

POSITIVE_SUFFIX = ", best quality, extremely detailed"
NEGATIVE_PROMPT = (
    "longbody, lowres, bad anatomy, bad hands, missing fingers, extra digit, "
    "fewer digits, cropped, worst quality, low quality"
)


from dreamllm_tpu.models.dreamllm import encode_prompt_embeds  # noqa: E402


def main(argv=None):
    args, config = LazyArgumentParser().parse(argv)
    run_dir = default_setup(args, config)
    cfg, head_cfg = build_model_cfg(config)
    tokenizer = make_tokenizer(config, cfg)

    from dreamllm_tpu.models.dreamllm import init_dreamllm_params
    from dreamllm_tpu.models.sd.head import init_sd_head_params

    def make_params(rng):
        p = init_dreamllm_params(rng, cfg)
        p["sd_head"] = init_sd_head_params(jax.random.fold_in(rng, 1), head_cfg)
        return p

    params = jax.jit(make_params)(jax.random.PRNGKey(config.get("seed", 0)))
    ckpt_root = config.get("checkpoint", config["trainer"]["output_dir"])
    ck = latest_checkpoint(ckpt_root)
    if ck:
        params = load_params(ck, like=params)
        logger.info("loaded %s", ck)

    mode = config.get("mode", "t2i")
    prompt = config.get("prompt", "a photo of a dog")
    steps = config.get("num_inference_steps", 50)
    guidance = config.get("guidance_scale", 3.5)
    rng = jax.random.PRNGKey(config.get("sample_seed", 0))

    out_dir = os.path.join(run_dir, "samples")
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    if config.get("head_type", "sd") == "sdxl":
        from dreamllm_tpu.models.sd.sdxl import sdxl_head_pipeline as pipeline_fn
    else:
        pipeline_fn = sd_head_pipeline

    if mode == "t2i":
        cond = encode_prompt_embeds(params, cfg, tokenizer, prompt + POSITIVE_SUFFIX)
        neg = encode_prompt_embeds(params, cfg, tokenizer, NEGATIVE_PROMPT)
        imgs = pipeline_fn(
            params["sd_head"], head_cfg, cond, neg, rng,
            num_inference_steps=steps, guidance_scale=guidance,
        )
        for i, img in enumerate(np.asarray(imgs)):
            path = os.path.join(out_dir, f"t2i_{i:03d}.png")
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
            logger.info("wrote %s", path)
    elif mode == "interleaved":
        st = cfg.special_tokens
        ids = jnp.asarray([[st.bos] + tokenizer.encode(prompt)], jnp.int32)
        out = generate_interleaved(
            params, cfg, params["sd_head"], head_cfg, ids,
            InterleavedConfig(
                max_new_tokens=config.get("max_new_tokens", 256),
                max_images=config.get("max_images", 2),
                num_inference_steps=steps,
                guidance_scale=guidance,
                sampling=SamplingConfig(temperature=0.7, top_p=0.9),
            ),
            rng,
        )
        doc_parts = []
        for i, (kind, payload) in enumerate(out["segments"]):
            if kind == "text":
                doc_parts.append(tokenizer.decode(np.asarray(payload).tolist()))
            else:
                path = os.path.join(out_dir, f"interleaved_{i:03d}.png")
                Image.fromarray((np.asarray(payload) * 255).astype(np.uint8)).save(path)
                doc_parts.append(f"![image]({path})")
        doc = "\n\n".join(doc_parts)
        with open(os.path.join(out_dir, "document.md"), "w") as f:
            f.write(doc)
        logger.info("wrote interleaved document with %d images", len(out["images"]))
    else:
        raise ValueError(mode)
    return out_dir


if __name__ == "__main__":
    main()
