"""Plain Stable Diffusion / SDXL fine-tuning (reference
projects/stable_diffusion/{train,train_sdxl}.py — hand-rolled accelerate
loops with EMA + validation images).

Trains the UNet on image/caption pairs with a *fixed* conditioning encoder
(here: dream-query-free — captions are embedded by a provided text-encoder
fn; for the DreamLLM stack the conditioner is the LLM, see projects/dreamllm).
This project exercises the diffusion stack standalone: DDPM training loss,
EMA of UNet params, periodic sampling.

``head_type: "sdxl"`` in the config (or the ``train_sdxl`` entry point)
switches to the SDXL head: dual conditioning (per-token context + pooled
``text_embeds`` via the global projector), ``add_time_ids``
micro-conditioning, and the fp32-VAE policy — the reference's separate
``train_sdxl.py`` (reference :1-80, configs/base_xl.py:1) as a config
switch over the same loop.

    python -m projects.stable_diffusion.train --config_file .../smoke.py
    python -m projects.stable_diffusion.train_sdxl --config_file .../smoke_xl.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import zlib
import numpy as np

import dreamllm_tpu.data.catalog  # noqa: F401
from dreamllm_tpu.config import LazyArgumentParser, default_setup, instantiate
from dreamllm_tpu.data import DataManager
from dreamllm_tpu.models.sd import UNetConfig, VAEConfig, init_unet_params, init_vae_params
from dreamllm_tpu.models.sd.head import SDHeadConfig, sd_head_loss, sd_head_pipeline
from dreamllm_tpu.models.sd.schedulers import make_schedule
from dreamllm_tpu.models.projector import init_projector_params
from dreamllm_tpu.train import OptimizerConfig, init_train_state, make_optimizer
from dreamllm_tpu.train.optim import ema_decay_schedule, ema_update
from dreamllm_tpu.train.step import TrainState
from dreamllm_tpu.train.trainer import Trainer, TrainerConfig
from dreamllm_tpu.utils.logging import get_logger
from dreamllm_tpu.utils.metrics_logger import MetricsLogger

logger = get_logger("projects.stable_diffusion.train")


def main(argv=None, force_head_type: str | None = None):
    args, config = LazyArgumentParser().parse(argv)
    run_dir = default_setup(args, config)

    h = instantiate(config["sd_head"])
    head_type = force_head_type or config.get("head_type", "sd")
    if head_type == "sdxl":
        from dreamllm_tpu.models.sd.sdxl import (
            SDXLHeadConfig,
            init_sdxl_head_params,
            sdxl_head_loss,
            sdxl_head_pipeline,
        )

        head_cfg = SDXLHeadConfig(**h)
        loss_fn_impl, pipeline_impl = sdxl_head_loss, sdxl_head_pipeline

        def make_params(rng):
            return init_sdxl_head_params(rng, head_cfg)
    else:
        head_cfg = SDHeadConfig(**h)
        loss_fn_impl, pipeline_impl = sd_head_loss, sd_head_pipeline

        def make_params(rng):
            k = jax.random.split(rng, 3)
            return {
                "projector": init_projector_params(k[0], head_cfg.projector_cfg()),
                "unet": init_unet_params(k[1], head_cfg.unet),
                "vae": init_vae_params(k[2], head_cfg.vae),
            }

    cond_dim = config.get("cond_dim", head_cfg.llm_hidden_size)
    cond_len = config.get("cond_len", 16)

    params = jax.jit(make_params)(jax.random.PRNGKey(config.get("seed", 0)))
    use_ema = config.get("use_ema", True)
    ema = jax.tree.map(jnp.copy, params["unet"]) if use_ema else None

    ocfg = OptimizerConfig(**config["optimizer"])
    tx = make_optimizer(ocfg)
    state = init_train_state(params, tx)

    import optax

    @jax.jit
    def step_fn(state, batch, rng):
        def loss_fn(p):
            kw = {}
            if head_type == "sdxl" and "add_time_ids" in batch:
                kw["add_time_ids"] = batch["add_time_ids"]
            loss, aux = loss_fn_impl(
                p, head_cfg,
                batch["images_dm"], batch["cond"], batch["uncond"],
                batch["valid"], rng, **kw,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new = TrainState(state.step + 1, new_params, opt_state)
        return new, dict(aux, loss=loss)

    # toy caption-conditioned stream: random hashed caption embeddings
    d = config["data"]
    dm = DataManager()
    mixed = dm(d["datasets"], size_list=d.get("size_list"),
               ratios=d.get("ratios"), total_size=d.get("total_size"))
    bs = d["batch_size"]
    size_dm = d.get("image_size_dm", 32)
    rng_np = np.random.default_rng(0)

    def embed_caption(text: str) -> np.ndarray:
        # crc32, not builtin hash(): PYTHONHASHSEED salting would make the
        # embedding differ across processes/resumes (same pitfall documented
        # in data/tokenization.py ToyTokenizer)
        g = np.random.default_rng(zlib.crc32(text.encode()) % 2**31)
        return g.standard_normal((cond_len, cond_dim)).astype(np.float32)

    def stream():
        i = 0
        while True:
            imgs, conds = [], []
            for _ in range(bs):
                s = mixed[i % len(mixed)]
                i += 1
                arr = np.asarray(s.image, np.float32)
                if arr.max() > 1.5:
                    arr = arr / 255.0
                yi = (np.arange(size_dm) * arr.shape[0] / size_dm).astype(int)
                xi = (np.arange(size_dm) * arr.shape[1] / size_dm).astype(int)
                imgs.append(arr[yi][:, xi] * 2 - 1)
                conds.append(embed_caption(s.text))
            yield {
                "images_dm": jnp.asarray(np.stack(imgs))[:, None],
                "cond": jnp.asarray(np.stack(conds))[:, None],
                "uncond": jnp.zeros((1, cond_len, cond_dim)),
                "valid": jnp.ones((bs, 1), bool),
            }

    tcfg = TrainerConfig(**config["trainer"])
    mlog = MetricsLogger(run_dir, project="sd_tpu")

    ema_state = {"ema": ema}

    class EMACallback:
        def on_step(self, trainer, step, aux):
            if use_ema:
                decay = ema_decay_schedule(jnp.asarray(step, jnp.float32))
                ema_state["ema"] = ema_update(
                    ema_state["ema"], trainer.state.params["unet"], decay
                )

    trainer = Trainer(tcfg, step_fn, stream(), state, callbacks=[mlog, EMACallback()])
    final = trainer.train()

    # validation sample with (EMA) weights
    val_params = dict(final.params)
    if use_ema:
        val_params["unet"] = ema_state["ema"]
    img = pipeline_impl(
        val_params, head_cfg,
        jnp.asarray(embed_caption("validation sample"))[None],
        jnp.zeros((1, cond_len, cond_dim)),
        jax.random.PRNGKey(1),
        num_inference_steps=config.get("num_inference_steps", 20),
        guidance_scale=config.get("guidance_scale", 3.0),
    )
    mlog.log_images({"validation": img[0]}, int(final.step))
    mlog.finish()
    return final


if __name__ == "__main__":
    main()
