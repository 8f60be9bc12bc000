"""SDXL diffusion head: dual conditioning + micro-conditioning time ids.

TPU-native equivalent of the reference's `StableDiffusionXLHead`
(omni/models/dreamllm_sdxl/modeling_plugins.py:91-215) and
`SDXLDataProcessor` (:14-44):

  * a **global projector** (llm_hidden → 1280) emulates SDXL's pooled second
    text encoder: mean-pool the dream-query hidden states → ``text_embeds``
    (:91-106, 196-215);
  * ``add_time_ids`` = (original_size, crop_top_left, target_size) per image,
    embedded sinusoidally inside the UNet ("text_time" addition embedding);
  * **fp32-VAE policy** — the SDXL VAE is numerically fragile in bf16, so VAE
    params/compute stay fp32 while the UNet runs in the working dtype
    (reference ``to()`` override :140-149).

The UNet itself is models/sd/unet.py with ``sdxl_unet_config()``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.models.projector import (
    ProjectorConfig,
    init_projector_params,
    projector_forward,
)
from dreamllm_tpu.models.sd.head import SDHeadConfig
from dreamllm_tpu.models.sd.schedulers import (
    add_noise,
    classifier_free_guidance,
    ddim_step,
    ddim_timesteps,
    dpm_solver_step,
    dpm_solver_timesteps,
    get_velocity,
    rescale_noise_cfg,
    snr,
)
from dreamllm_tpu.models.sd.unet import UNetConfig, init_unet_params, sdxl_unet_config, unet_forward
from dreamllm_tpu.models.sd.vae import (
    init_vae_params,
    vae_decode,
    vae_encode,
    vae_sample,
)

Params = dict[str, Any]


def _sdxl_vae_config():
    from dreamllm_tpu.models.sd.vae import VAEConfig

    # SDXL's VAE is trained with scaling_factor 0.13025 (vs 0.18215 for
    # SD-1.x/2.x) — inheriting the SD default silently mis-scales latents
    # ~1.4x against the pretrained UNet and the N(0,1) sampling prior
    return VAEConfig(scaling_factor=0.13025)


@dataclasses.dataclass(frozen=True)
class SDXLHeadConfig(SDHeadConfig):
    unet: UNetConfig = dataclasses.field(default_factory=sdxl_unet_config)
    vae: Any = dataclasses.field(default_factory=_sdxl_vae_config)
    pooled_dim: int = 1280        # SDXL pooled text-embedding width
    vae_dtype: Any = jnp.float32  # fp32-VAE policy

    def global_projector_cfg(self) -> ProjectorConfig:
        return ProjectorConfig(
            projector_type="linear", in_dim=self.llm_hidden_size, out_dim=self.pooled_dim
        )


def make_add_time_ids(
    original_size: tuple[int, int],
    crop_top_left: tuple[int, int],
    target_size: tuple[int, int],
    batch: int,
) -> jnp.ndarray:
    """[B, 6] micro-conditioning ids (SDXLDataProcessor :14-44)."""
    ids = jnp.asarray(
        [list(original_size) + list(crop_top_left) + list(target_size)], jnp.float32
    )
    return jnp.broadcast_to(ids, (batch, 6))


def init_sdxl_head_params(rng: jax.Array, cfg: SDXLHeadConfig) -> Params:
    k = jax.random.split(rng, 4)
    vae_cfg = dataclasses.replace(cfg.vae, dtype=cfg.vae_dtype)
    return {
        "projector": init_projector_params(k[0], cfg.projector_cfg()),
        "global_projector": init_projector_params(k[1], cfg.global_projector_cfg()),
        "unet": init_unet_params(k[2], cfg.unet),
        "vae": init_vae_params(k[3], vae_cfg),
    }


def _pooled(params: Params, cfg: SDXLHeadConfig, states: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool token states → global projector → [B, 1280] text_embeds
    (reference :196-215)."""
    pooled = jnp.mean(states, axis=1, keepdims=True)
    out = projector_forward(params["global_projector"], cfg.global_projector_cfg(), pooled)
    return out[:, 0]


def sdxl_head_loss(
    params: Params,
    cfg: SDXLHeadConfig,
    images_dm: jnp.ndarray,     # [B, M, H, W, 3] in [-1, 1]
    cond: jnp.ndarray,          # [B, M, n_queries, llm_hidden]
    uncond: jnp.ndarray,        # [1, n_queries, llm_hidden]
    valid: jnp.ndarray,         # [B, M]
    rng: jax.Array,
    add_time_ids: jnp.ndarray | None = None,  # [B, M, 6]
    latents: jnp.ndarray | None = None,       # [B, M, h, w, 4] pre-encoded
    remat_unet: bool = False,                 # per-block UNet checkpointing
):
    """``latents``, when given, are VAE latents ALREADY sampled and scaled
    by ``cfg.vae.scaling_factor`` (see ``encode_latents``): the frozen VAE
    encoder then runs as a separate compiled program and this loss skips it
    entirely — at 1024px that encoder is a large fraction of the joint
    graph, and splitting it is what fits the step under a constrained
    compiler. The rng split layout is unchanged so cond-dropout/noise/
    timestep draws are identical either way (r_lat simply goes unused)."""
    sched = cfg.schedule()
    b, m = images_dm.shape[:2]
    n = b * m
    cond = cond.reshape(n, cond.shape[2], cond.shape[3])
    valid_f = valid.reshape(n).astype(jnp.float32)
    if add_time_ids is None:
        hw = images_dm.shape[2:4]
        add_time_ids = make_add_time_ids(hw, (0, 0), hw, n)
    else:
        add_time_ids = add_time_ids.reshape(n, 6)

    r_lat, r_noise, r_t, r_drop, r_pert = jax.random.split(rng, 5)
    if latents is None:
        imgs = images_dm.reshape((n,) + images_dm.shape[2:]).astype(cfg.vae_dtype)
        vae_cfg = dataclasses.replace(cfg.vae, dtype=cfg.vae_dtype)
        mean, logvar = vae_encode(params["vae"], vae_cfg, imgs)
        latents = vae_sample(mean, logvar, r_lat) * cfg.vae.scaling_factor
    else:
        latents = latents.reshape((n,) + latents.shape[2:])
    latents = jax.lax.stop_gradient(latents).astype(cond.dtype)

    noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
    # same training augmentations as sd_head_loss (head.py:132-140) — these
    # knobs are inherited config and must not silently no-op on SDXL
    if cfg.noise_offset > 0:
        off = jax.random.normal(r_pert, (n, 1, 1, latents.shape[-1]), latents.dtype)
        noise = noise + cfg.noise_offset * off
    model_input_noise = noise
    if cfg.input_perturbation > 0:
        model_input_noise = noise + cfg.input_perturbation * jax.random.normal(
            jax.random.fold_in(r_pert, 1), noise.shape, noise.dtype
        )
    t = jax.random.randint(r_t, (n,), 0, sched.num_train_timesteps)
    noisy = add_noise(sched, latents, model_input_noise, t)

    drop = jax.random.bernoulli(r_drop, cfg.uncond_prob, (n, 1, 1))
    states = jnp.where(drop, uncond.astype(cond.dtype), cond)
    ctx = projector_forward(params["projector"], cfg.projector_cfg(), states)
    text_embeds = _pooled(params, cfg, states)

    pred = unet_forward(
        params["unet"], cfg.unet, noisy, t, ctx,
        added_cond={"time_ids": add_time_ids, "text_embeds": text_embeds},
        remat=remat_unet,
    )

    target = noise if cfg.prediction_type == "epsilon" else get_velocity(sched, latents, noise, t)
    per = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
    if cfg.snr_gamma is not None:
        s = snr(sched, t)
        w = jnp.minimum(s, cfg.snr_gamma)
        per = per * (w / s if cfg.prediction_type == "epsilon" else w / (s + 1.0))
    loss = jnp.sum(per * valid_f) / jnp.maximum(jnp.sum(valid_f), 1.0)
    return loss, {"dm_mse": loss}


def make_sdxl_head_loss_fn(cfg: SDXLHeadConfig):
    def fn(head_params, images_dm, cond, uncond, valid, rng,
           add_time_ids=None, latents=None, **_):
        return sdxl_head_loss(
            head_params, cfg, images_dm, cond, uncond, valid, rng,
            add_time_ids=add_time_ids, latents=latents,
        )

    return fn


def encode_latents(params: Params, cfg: SDXLHeadConfig,
                   images_dm: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """[B, M, H, W, 3] -> [B, M, h, w, 4] sampled+scaled VAE latents, for
    the ``latents=`` fast path of ``sdxl_head_loss`` (jit this separately;
    the VAE is frozen so no gradients are lost by the split)."""
    b, m = images_dm.shape[:2]
    imgs = images_dm.reshape((b * m,) + images_dm.shape[2:]).astype(cfg.vae_dtype)
    vae_cfg = dataclasses.replace(cfg.vae, dtype=cfg.vae_dtype)
    mean, logvar = vae_encode(params["vae"], vae_cfg, imgs)
    lat = vae_sample(mean, logvar, rng) * cfg.vae.scaling_factor
    return lat.reshape((b, m) + lat.shape[1:])


def sdxl_head_pipeline(
    params: Params,
    cfg: SDXLHeadConfig,
    cond_embeds: jnp.ndarray,
    uncond_embeds: jnp.ndarray,
    rng: jax.Array,
    *,
    height: int | None = None,
    width: int | None = None,
    num_inference_steps: int = 50,
    guidance_scale: float = 5.0,
    guidance_rescale: float = 0.0,
    sampler: str = "ddim",
    latents: jnp.ndarray | None = None,  # initial-noise override (diffusers
                                         # `latents=` convention; parity tests)
) -> jnp.ndarray:
    """1024px-class generation with dual conditioning (reference inference
    path, dreamllm_sdxl/modeling_plugins.py pipeline)."""
    sched = cfg.schedule()
    b = cond_embeds.shape[0]
    vae_factor = 2 ** (len(cfg.vae.block_out_channels) - 1)
    full_h = height or cfg.unet.sample_size * vae_factor
    full_w = width or cfg.unet.sample_size * vae_factor
    h, w = full_h // vae_factor, full_w // vae_factor

    pcfg = cfg.projector_cfg()
    cond = projector_forward(params["projector"], pcfg, cond_embeds)
    uncond = projector_forward(params["projector"], pcfg, uncond_embeds)
    pooled_c = _pooled(params, cfg, cond_embeds)
    pooled_u = _pooled(params, cfg, uncond_embeds)
    if uncond.shape[0] == 1 and b > 1:
        uncond = jnp.broadcast_to(uncond, (b,) + uncond.shape[1:])
        pooled_u = jnp.broadcast_to(pooled_u, (b,) + pooled_u.shape[1:])
    ctx = jnp.concatenate([uncond, cond], axis=0)
    text_embeds = jnp.concatenate([pooled_u, pooled_c], axis=0)
    time_ids = make_add_time_ids((full_h, full_w), (0, 0), (full_h, full_w), 2 * b)

    if latents is None:
        latents = jax.random.normal(rng, (b, h, w, cfg.unet.in_channels), jnp.float32)
    if sampler == "ddim":
        ts = ddim_timesteps(sched.num_train_timesteps, num_inference_steps)
    else:
        ts = dpm_solver_timesteps(sched.num_train_timesteps, num_inference_steps)
    ts_prev = jnp.concatenate([ts[1:], jnp.full((1,), -1, jnp.int32)])

    def denoise(latents, t):
        lat_in = jnp.concatenate([latents, latents], axis=0).astype(ctx.dtype)
        out = unet_forward(
            params["unet"], cfg.unet, lat_in, jnp.broadcast_to(t, (2 * b,)), ctx,
            added_cond={"time_ids": time_ids, "text_embeds": text_embeds},
        ).astype(jnp.float32)
        un, co = jnp.split(out, 2, axis=0)
        g = classifier_free_guidance(co, un, guidance_scale)
        return rescale_noise_cfg(g, co, guidance_rescale)

    if sampler == "ddim":
        def body(i, latents):
            t, tp = ts[i], ts_prev[i]
            mo = denoise(latents, t)
            return ddim_step(sched, mo, jnp.broadcast_to(t, (b,)),
                             jnp.broadcast_to(tp, (b,)), latents)

        latents = jax.lax.fori_loop(0, ts.shape[0], body, latents)
    else:
        def body(i, carry):
            latents, last_x0, has_last = carry
            t, tp = ts[i], ts_prev[i]
            mo = denoise(latents, t)
            tb = jnp.broadcast_to(t, (b,))
            tpb = jnp.broadcast_to(tp, (b,))
            tl = jnp.broadcast_to(ts[jnp.maximum(i - 1, 0)], (b,))
            x1, x0a = dpm_solver_step(sched, mo, tb, tpb, latents, None, None)
            x2, x0b = dpm_solver_step(sched, mo, tb, tpb, latents, last_x0, tl)
            return (jnp.where(has_last, x2, x1), jnp.where(has_last, x0b, x0a), jnp.bool_(True))

        latents, _, _ = jax.lax.fori_loop(
            0, ts.shape[0], body, (latents, jnp.zeros_like(latents), jnp.bool_(False))
        )

    vae_cfg = dataclasses.replace(cfg.vae, dtype=cfg.vae_dtype)
    imgs = vae_decode(
        params["vae"], vae_cfg, (latents / cfg.vae.scaling_factor).astype(cfg.vae_dtype)
    )
    return jnp.clip(imgs.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
