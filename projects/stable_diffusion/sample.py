"""Plain Stable-Diffusion sampling CLI (reference projects/dreamllm/
cli_stable_diffusion_pipeline.py): load converted SD weights and sample from
caption embeddings supplied by any encoder fn — the smoke path uses hashed
caption embeddings, the real path a CLIP text tower via
convert_clip_model_dir.

    python -m projects.stable_diffusion.sample \
        --config_file projects/stable_diffusion/configs/smoke.py \
        prompt="a photo of a corgi" num_inference_steps=20
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import zlib
import numpy as np

from dreamllm_tpu.config import LazyArgumentParser, default_setup, instantiate
from dreamllm_tpu.models.sd.head import SDHeadConfig, sd_head_pipeline
from dreamllm_tpu.train.checkpoints import latest_checkpoint, load_params
from dreamllm_tpu.utils.image import save_image
from dreamllm_tpu.utils.logging import get_logger

logger = get_logger("projects.stable_diffusion.sample")


def main(argv=None):
    args, config = LazyArgumentParser().parse(argv)
    run_dir = default_setup(args, config)
    h = instantiate(config["sd_head"])
    head_cfg = SDHeadConfig(**h)
    cond_dim = config.get("cond_dim", head_cfg.llm_hidden_size)
    cond_len = config.get("cond_len", 16)

    from projects.stable_diffusion.train import main as _  # noqa: F401 (shared cfg shape)
    from dreamllm_tpu.models.projector import init_projector_params
    from dreamllm_tpu.models.sd import init_unet_params, init_vae_params

    def make_params(rng):
        k = jax.random.split(rng, 3)
        return {
            "projector": init_projector_params(k[0], head_cfg.projector_cfg()),
            "unet": init_unet_params(k[1], head_cfg.unet),
            "vae": init_vae_params(k[2], head_cfg.vae),
        }

    params = jax.jit(make_params)(jax.random.PRNGKey(config.get("seed", 0)))
    ck = latest_checkpoint(config.get("checkpoint", config["trainer"]["output_dir"]))
    if ck:
        loaded = load_params(ck)
        for key in ("projector", "unet", "vae"):
            if key in loaded:
                params[key] = loaded[key]
        if "sd_head" in loaded:
            params = loaded["sd_head"]
        logger.info("loaded %s", ck)

    prompt = config.get("prompt", "a photo")
    # crc32, not builtin hash(): stable across interpreter processes
    g = np.random.default_rng(zlib.crc32(prompt.encode()) % 2**31)
    cond = jnp.asarray(g.standard_normal((1, cond_len, cond_dim)), jnp.float32)
    uncond = jnp.zeros((1, cond_len, cond_dim))

    imgs = sd_head_pipeline(
        params, head_cfg, cond, uncond,
        jax.random.PRNGKey(config.get("sample_seed", 0)),
        num_inference_steps=config.get("num_inference_steps", 20),
        guidance_scale=config.get("guidance_scale", 7.5),
        sampler=config.get("sampler", "dpm"),
        deepcache_interval=config.get("deepcache_interval", 1),
    )
    out = os.path.join(run_dir, "sample.png")
    save_image(np.asarray(imgs[0]), out)
    logger.info("wrote %s", out)
    return out


if __name__ == "__main__":
    main()
