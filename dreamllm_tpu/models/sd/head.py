"""StableDiffusionHead: dream-query conditioned diffusion training + sampling.

TPU-native equivalent of the reference's `StableDiffusionHead`
(modeling_plugins.py:335-850): a projector mapping LLM hidden states
(4096) → UNet cross-attention dim, plus the training forward (VAE encode →
noise → CFG condition dropout → UNet → (min-SNR) MSE, reference :493-577)
and the inference `pipeline()` (CFG-duplicated denoise loop → VAE decode,
reference :671-850).

Differences, deliberate:
  * the denoise loop is a `lax.fori_loop` over a static timestep table —
    one compile, no host round-trips per step;
  * condition dropout mixes cond/uncond with a Bernoulli mask exactly like
    the reference (:539-543) but batched over dream spans with a validity
    mask instead of python-level span lists;
  * supports DDIM (50-150 step parity protocol) and DPM-Solver++(2M)
    (20-30 steps — the fast path the reference lacks).
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
from dreamllm_tpu.models.sd.schedulers import (
    DiffusionSchedule,
    add_noise,
    classifier_free_guidance,
    ddim_step,
    ddim_timesteps,
    dpm_solver_step,
    dpm_solver_timesteps,
    get_velocity,
    make_schedule,
    rescale_noise_cfg,
    snr,
)
from dreamllm_tpu.models.sd.unet import UNetConfig, init_unet_params, unet_forward
from dreamllm_tpu.models.sd.vae import (
    VAEConfig,
    init_vae_params,
    vae_decode,
    vae_encode,
    vae_sample,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SDHeadConfig:
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    llm_hidden_size: int = 4096
    projector: ProjectorConfig | None = None  # default: linear llm→cross_attn
    prediction_type: str = "epsilon"
    num_train_timesteps: int = 1000
    # training knobs (reference :521-543, 558-572)
    uncond_prob: float = 0.1          # CFG condition dropout
    noise_offset: float = 0.0
    input_perturbation: float = 0.0
    snr_gamma: float | None = None    # min-SNR-γ loss weighting
    # compute dtype of the PROJECTOR (UNet/VAE carry their own dtype in
    # their sub-configs; per the reference's fp32-VAE policy they are
    # configured independently)
    dtype: Any = jnp.float32

    def projector_cfg(self) -> ProjectorConfig:
        if self.projector is not None:
            return self.projector
        return ProjectorConfig(
            projector_type="linear",
            in_dim=self.llm_hidden_size,
            out_dim=self.unet.cross_attention_dim,
            dtype=self.dtype,
        )

    def schedule(self) -> DiffusionSchedule:
        return make_schedule(
            num_train_timesteps=self.num_train_timesteps,
            prediction_type=self.prediction_type,
        )


def init_sd_head_params(rng: jax.Array, cfg: SDHeadConfig) -> Params:
    k = jax.random.split(rng, 3)
    return {
        "projector": init_projector_params(k[0], cfg.projector_cfg()),
        "unet": init_unet_params(k[1], cfg.unet),
        "vae": init_vae_params(k[2], cfg.vae),
    }


# ---------------------------------------------------------------------------
# Training loss
# ---------------------------------------------------------------------------


def sd_head_loss(
    params: Params,
    cfg: SDHeadConfig,
    images_dm: jnp.ndarray,   # [B, M, H, W, 3] in [-1, 1]
    cond: jnp.ndarray,        # [B, M, n_queries, llm_hidden]
    uncond: jnp.ndarray,      # [1, n_queries, llm_hidden]
    valid: jnp.ndarray,       # [B, M] bool
    rng: jax.Array,
    latents: jnp.ndarray | None = None,   # [B, M, h, w, 4] pre-encoded
    remat_unet: bool = False,             # per-block UNet checkpointing
) -> tuple[jnp.ndarray, dict]:
    """Diffusion ("vm") loss over valid dream spans (reference :493-577).

    ``latents``, when given, are VAE latents ALREADY sampled and scaled by
    ``cfg.vae.scaling_factor`` (``encode_sd_latents``) — the frozen VAE
    encoder then runs in its own compiled program and this loss skips it
    (same contract as the SDXL head's split path; the rng split layout is
    unchanged so the noise/timestep/dropout draws are identical)."""
    sched = cfg.schedule()
    b, m = images_dm.shape[:2]
    n = b * m
    cond = cond.reshape(n, cond.shape[2], cond.shape[3])
    valid_f = valid.reshape(n).astype(jnp.float32)

    r_lat, r_noise, r_t, r_drop, r_pert = jax.random.split(rng, 5)

    if latents is None:
        imgs = images_dm.reshape((n,) + images_dm.shape[2:])
        # VAE encode (frozen; stop_gradient matches the reference freezing VAE)
        mean, logvar = vae_encode(params["vae"], cfg.vae, imgs)
        latents = vae_sample(mean, logvar, r_lat) * cfg.vae.scaling_factor
    else:
        latents = latents.reshape((n,) + latents.shape[2:])
    latents = jax.lax.stop_gradient(latents)

    noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
    if cfg.noise_offset > 0:
        # per-sample channel-wise offset (reference :521-523)
        off = jax.random.normal(r_pert, (n, 1, 1, latents.shape[-1]), latents.dtype)
        noise = noise + cfg.noise_offset * off
    model_input_noise = noise
    if cfg.input_perturbation > 0:
        model_input_noise = noise + cfg.input_perturbation * jax.random.normal(
            jax.random.fold_in(r_pert, 1), noise.shape, noise.dtype
        )

    t = jax.random.randint(r_t, (n,), 0, sched.num_train_timesteps)
    noisy = add_noise(sched, latents, model_input_noise, t)

    # CFG condition dropout: Bernoulli-mix cond/uncond states (reference :539-543)
    drop = jax.random.bernoulli(r_drop, cfg.uncond_prob, (n, 1, 1))
    states = jnp.where(drop, uncond.astype(cond.dtype), cond)
    states = projector_forward(params["projector"], cfg.projector_cfg(), states)

    pred = unet_forward(params["unet"], cfg.unet, noisy, t, states,
                        remat=remat_unet)

    if cfg.prediction_type == "epsilon":
        target = noise
    elif cfg.prediction_type == "v_prediction":
        target = get_velocity(sched, latents, noise, t)
    else:
        raise ValueError(cfg.prediction_type)

    per = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
    if cfg.snr_gamma is not None:
        s = snr(sched, t)
        w = jnp.minimum(s, cfg.snr_gamma)
        w = w / s if cfg.prediction_type == "epsilon" else w / (s + 1.0)
        per = per * w
    loss = jnp.sum(per * valid_f) / jnp.maximum(jnp.sum(valid_f), 1.0)
    return loss, {"dm_mse": loss}


def make_head_loss_fn(cfg: SDHeadConfig):
    """Adapter matching dreamllm_forward's ``head_loss_fn`` signature.
    Ignores SDXL-only extras (add_time_ids)."""

    def fn(head_params, images_dm, cond, uncond, valid, rng, latents=None,
           **_extras):
        return sd_head_loss(head_params, cfg, images_dm, cond, uncond, valid,
                            rng, latents=latents)

    return fn


def encode_sd_latents(params: Params, cfg: SDHeadConfig,
                      images_dm: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """[B, M, H, W, 3] -> [B, M, h, w, 4] sampled+scaled VAE latents for the
    ``latents=`` fast path of ``sd_head_loss`` (jit separately; the VAE is
    frozen so no gradient is lost by the split). SDXL twin:
    ``models/sd/sdxl.encode_latents`` (fp32-VAE policy)."""
    b, m = images_dm.shape[:2]
    imgs = images_dm.reshape((b * m,) + images_dm.shape[2:])
    mean, logvar = vae_encode(params["vae"], cfg.vae, imgs)
    lat = vae_sample(mean, logvar, rng) * cfg.vae.scaling_factor
    return lat.reshape((b, m) + lat.shape[1:])


# ---------------------------------------------------------------------------
# Inference pipeline
# ---------------------------------------------------------------------------


def sd_head_pipeline(
    params: Params,
    cfg: SDHeadConfig,
    cond_embeds: jnp.ndarray,    # [B, n_queries, llm_hidden]
    uncond_embeds: jnp.ndarray,  # [B or 1, n_queries, llm_hidden]
    rng: jax.Array,
    *,
    height: int | None = None,
    width: int | None = None,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    guidance_rescale: float = 0.0,
    sampler: str = "ddim",  # "ddim" | "dpm"
    deepcache_interval: int = 1,  # >1: DeepCache — full UNet every k-th step,
                                  # shallow cached steps between (see
                                  # unet_forward_shallow; quality/speed dial)
    return_latents: bool = False,
    latents: jnp.ndarray | None = None,  # initial noise override (diffusers
                                         # pipeline `latents=` convention)
) -> jnp.ndarray:
    """Generate images from LLM dream-query hidden states
    (reference pipeline :671-850). Returns [B, H, W, 3] in [0, 1]."""
    sched = cfg.schedule()
    b = cond_embeds.shape[0]
    vae_factor = 2 ** (len(cfg.vae.block_out_channels) - 1)  # 8 for SD
    h = (height or cfg.unet.sample_size * vae_factor) // vae_factor
    w = (width or cfg.unet.sample_size * vae_factor) // vae_factor
    lat_ch = cfg.unet.in_channels

    pcfg = cfg.projector_cfg()
    cond = projector_forward(params["projector"], pcfg, cond_embeds)
    uncond = projector_forward(params["projector"], pcfg, uncond_embeds)
    if uncond.shape[0] == 1 and b > 1:
        uncond = jnp.broadcast_to(uncond, (b,) + uncond.shape[1:])
    ctx = jnp.concatenate([uncond, cond], axis=0)  # [2B, S, D]

    if latents is None:
        latents = jax.random.normal(rng, (b, h, w, lat_ch), jnp.float32)

    if sampler == "ddim":
        ts = ddim_timesteps(sched.num_train_timesteps, num_inference_steps)
    elif sampler == "dpm":
        ts = dpm_solver_timesteps(sched.num_train_timesteps, num_inference_steps)
    else:
        raise ValueError(sampler)
    ts_prev = jnp.concatenate([ts[1:], jnp.full((1,), -1, jnp.int32)])

    from dreamllm_tpu.models.sd.unet import unet_forward_shallow

    deep_ch = cfg.unet.block_out_channels[min(1, len(cfg.unet.block_out_channels) - 1)]
    deep0 = jnp.zeros((2 * b, h, w, deep_ch), cond.dtype)

    def denoise(i, latents, deep):
        lat_in = jnp.concatenate([latents, latents], axis=0).astype(cond.dtype)
        tb2 = jnp.broadcast_to(ts[i], (2 * b,))
        if deepcache_interval <= 1:
            out, new_deep = unet_forward(
                params["unet"], cfg.unet, lat_in, tb2, ctx, return_deep=True
            )
        else:
            def full(_):
                return unet_forward(
                    params["unet"], cfg.unet, lat_in, tb2, ctx, return_deep=True
                )

            def cached(_):
                o = unet_forward_shallow(
                    params["unet"], cfg.unet, lat_in, tb2, ctx, deep
                )
                return o, deep

            out, new_deep = jax.lax.cond(i % deepcache_interval == 0, full, cached, None)
        out = out.astype(jnp.float32)
        un, co = jnp.split(out, 2, axis=0)
        g = classifier_free_guidance(co, un, guidance_scale)
        return rescale_noise_cfg(g, co, guidance_rescale), new_deep

    if sampler == "ddim":
        def body(i, carry):
            latents, deep = carry
            t, t_prev = ts[i], ts_prev[i]
            model_out, deep = denoise(i, latents, deep)
            tb = jnp.broadcast_to(t, (b,))
            return ddim_step(sched, model_out, tb, jnp.broadcast_to(t_prev, (b,)), latents), deep

        latents, _ = jax.lax.fori_loop(0, ts.shape[0], body, (latents, deep0))
    else:
        def body(i, carry):
            latents, last_x0, has_last, deep = carry
            t, t_prev = ts[i], ts_prev[i]
            model_out, deep = denoise(i, latents, deep)
            tb = jnp.broadcast_to(t, (b,))
            tpb = jnp.broadcast_to(t_prev, (b,))
            t_last = jnp.broadcast_to(ts[jnp.maximum(i - 1, 0)], (b,))
            # first-order on step 0, second-order after
            x1, x0_a = dpm_solver_step(sched, model_out, tb, tpb, latents, None, None)
            x2, x0_b = dpm_solver_step(sched, model_out, tb, tpb, latents, last_x0, t_last)
            nxt = jnp.where(has_last, x2, x1)
            x0 = jnp.where(has_last, x0_b, x0_a)
            return nxt, x0, jnp.bool_(True), deep

        latents, _, _, _ = jax.lax.fori_loop(
            0, ts.shape[0], body,
            (latents, jnp.zeros_like(latents), jnp.bool_(False), deep0),
        )

    if return_latents:
        return latents
    imgs = vae_decode(params["vae"], cfg.vae, latents / cfg.vae.scaling_factor)
    return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)


def controlnet_pipeline(
    params: Params,
    cfg: SDHeadConfig,
    controlnet_params: Params,
    controlnet_cfg,
    cond_image: jnp.ndarray,     # [B, H, W, C] control image in [0, 1]
    cond_embeds: jnp.ndarray,    # [B, n_queries, llm_hidden]
    uncond_embeds: jnp.ndarray,
    rng: jax.Array,
    *,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    guidance_rescale: float = 0.0,
    conditioning_scale: float = 1.0,
    return_latents: bool = False,
    latents: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """ControlNet-conditioned generation from LLM dream-query hidden states —
    the reference's ``controlnet_pipeline`` (modeling_dreamllm.py:1891-2041),
    whose ControlNetHead class the reference itself ships disabled
    (modeling_plugins.py:853). DDIM sampler; the control image is
    CFG-duplicated like the latents (diffusers ControlNetPipeline
    convention). Returns [B, H, W, 3] in [0, 1]."""
    from dreamllm_tpu.models.sd.controlnet import controlnet_forward

    sched = cfg.schedule()
    b = cond_embeds.shape[0]
    vae_factor = 2 ** (len(cfg.vae.block_out_channels) - 1)
    h = cond_image.shape[1] // vae_factor
    w = cond_image.shape[2] // vae_factor
    lat_ch = cfg.unet.in_channels

    pcfg = cfg.projector_cfg()
    cond = projector_forward(params["projector"], pcfg, cond_embeds)
    uncond = projector_forward(params["projector"], pcfg, uncond_embeds)
    if uncond.shape[0] == 1 and b > 1:
        uncond = jnp.broadcast_to(uncond, (b,) + uncond.shape[1:])
    ctx = jnp.concatenate([uncond, cond], axis=0)
    cimg2 = jnp.concatenate([cond_image, cond_image], axis=0)

    if latents is None:
        latents = jax.random.normal(rng, (b, h, w, lat_ch), jnp.float32)

    ts = ddim_timesteps(sched.num_train_timesteps, num_inference_steps)
    ts_prev = jnp.concatenate([ts[1:], jnp.full((1,), -1, jnp.int32)])

    def body(i, latents):
        lat_in = jnp.concatenate([latents, latents], axis=0).astype(ctx.dtype)
        tb2 = jnp.broadcast_to(ts[i], (2 * b,))
        down_res, mid_res = controlnet_forward(
            controlnet_params, controlnet_cfg, lat_in, tb2, ctx, cimg2,
            conditioning_scale=conditioning_scale,
        )
        out = unet_forward(
            params["unet"], cfg.unet, lat_in, tb2, ctx,
            down_block_residuals=down_res, mid_block_residual=mid_res,
        ).astype(jnp.float32)
        un, co = jnp.split(out, 2, axis=0)
        g = classifier_free_guidance(co, un, guidance_scale)
        g = rescale_noise_cfg(g, co, guidance_rescale)
        tb = jnp.broadcast_to(ts[i], (b,))
        return ddim_step(sched, g, tb, jnp.broadcast_to(ts_prev[i], (b,)), latents)

    latents = jax.lax.fori_loop(0, ts.shape[0], body, latents)
    if return_latents:
        return latents
    imgs = vae_decode(params["vae"], cfg.vae, latents / cfg.vae.scaling_factor)
    return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)
