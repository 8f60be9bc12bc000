"""Diffusion noise schedules and samplers: DDPM, DDIM, DPM-Solver++(2M).

TPU-native replacement for the diffusers schedulers the reference drives
(DDPMScheduler for training, modeling_plugins.py:381,511-543; the inference
denoise loop :806-839 uses scheduler.step). Everything here is pure
functions over a precomputed :class:`DiffusionSchedule` table — no stateful
`set_timesteps`; samplers take static timestep arrays so the denoise loop is
a `lax.fori_loop`/`scan` with zero host sync.

Numerics match diffusers' defaults for Stable Diffusion:
  * betas: "scaled_linear" — linspace(sqrt(b0), sqrt(b1), T)^2 with
    b0=0.00085, b1=0.012, T=1000.
  * DDIM timestep spacing: "leading" with steps_offset=1 (SD convention).
  * prediction types: "epsilon" (SD 2.1 base) and "v_prediction" (SD 2.1-v).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    betas: jnp.ndarray            # [T]
    alphas_cumprod: jnp.ndarray   # [T]
    num_train_timesteps: int
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction"


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: str = "epsilon",
) -> DiffusionSchedule:
    if beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "squaredcos_cap_v2":
        t = np.arange(num_train_timesteps + 1, dtype=np.float64) / num_train_timesteps
        f = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.clip(1 - f[1:] / f[:-1], 0, 0.999)
    else:
        raise ValueError(beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample schedule values and broadcast to sample rank."""
    v = table[t].astype(jnp.float32)
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def add_noise(sched: DiffusionSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray):
    """Forward process q(x_t | x_0) (diffusers DDPMScheduler.add_noise)."""
    acp = _extract(sched.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise


def get_velocity(sched: DiffusionSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray):
    """v-prediction target: v = sqrt(acp)·ε − sqrt(1−acp)·x0."""
    acp = _extract(sched.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0


def pred_x0_eps(sched: DiffusionSchedule, model_out, x_t, t):
    """Recover (x0̂, ε̂) from the model output under the prediction type."""
    acp = _extract(sched.alphas_cumprod, t, x_t.ndim)
    sqrt_acp, sqrt_1macp = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)
    if sched.prediction_type == "epsilon":
        eps = model_out
        x0 = (x_t - sqrt_1macp * eps) / sqrt_acp
    elif sched.prediction_type == "v_prediction":
        x0 = sqrt_acp * x_t - sqrt_1macp * model_out
        eps = sqrt_acp * model_out + sqrt_1macp * x_t
    else:
        raise ValueError(sched.prediction_type)
    return x0, eps


def snr(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio per timestep (min-SNR-γ weighting,
    reference modeling_plugins.py:468-491)."""
    acp = sched.alphas_cumprod[t].astype(jnp.float32)
    return acp / (1.0 - acp)


# ---------------------------------------------------------------------------
# DDPM ancestral sampling (training-schedule step)
# ---------------------------------------------------------------------------


def ddpm_step(
    sched: DiffusionSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    x_t: jnp.ndarray,
    rng: jax.Array,
):
    """One ancestral DDPM step x_t → x_{t-1} (diffusers DDPMScheduler.step,
    variance_type="fixed_small", clip off — SD latents are unbounded)."""
    acp_t = _extract(sched.alphas_cumprod, t, x_t.ndim)
    acp_prev = _extract(
        jnp.concatenate([jnp.ones((1,), jnp.float32), sched.alphas_cumprod[:-1]]), t, x_t.ndim
    )
    beta_t = _extract(sched.betas, t, x_t.ndim)
    alpha_t = 1.0 - beta_t

    x0, _ = pred_x0_eps(sched, model_out, x_t, t)
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * x_t
    var = beta_t * (1.0 - acp_prev) / (1.0 - acp_t)
    noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
    nonzero = (t > 0).astype(jnp.float32).reshape((-1,) + (1,) * (x_t.ndim - 1))
    return mean + nonzero * jnp.sqrt(jnp.maximum(var, 1e-20)) * noise


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int, steps_offset: int = 1):
    """"leading" spacing + steps_offset, the SD convention
    (diffusers DDIMScheduler.set_timesteps)."""
    ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64) + steps_offset
    return jnp.asarray(np.clip(ts, 0, num_train_timesteps - 1), jnp.int32)


def ddim_step(
    sched: DiffusionSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    x_t: jnp.ndarray,
    eta: float = 0.0,
    rng: jax.Array | None = None,
):
    """Deterministic (eta=0) DDIM step t → t_prev. ``t_prev < 0`` means the
    final step. Matches diffusers DDIMScheduler.step numerics for SD
    checkpoints: their configs ship ``set_alpha_to_one=False``, so the final
    alpha_cumprod is ``alphas_cumprod[0]`` (~0.99915), not 1.0 — using 1.0
    deviates by ~3% of eps in every final latent."""
    acp_t = _extract(sched.alphas_cumprod, t, x_t.ndim)
    acp_prev = jnp.where(
        t_prev >= 0,
        sched.alphas_cumprod[jnp.maximum(t_prev, 0)],
        sched.alphas_cumprod[0],
    ).reshape(acp_t.shape)
    x0, eps = pred_x0_eps(sched, model_out, x_t, t)

    sigma = eta * jnp.sqrt(
        (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
    )
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * eps
    x_prev = jnp.sqrt(acp_prev) * x0 + dir_xt
    if eta > 0.0:
        assert rng is not None
        x_prev = x_prev + sigma * jax.random.normal(rng, x_t.shape, x_t.dtype)
    return x_prev


# ---------------------------------------------------------------------------
# DPM-Solver++(2M) — fast high-order sampler (20-25 steps ≈ 50-step DDIM)
# ---------------------------------------------------------------------------


def dpm_solver_timesteps(num_train_timesteps: int, num_inference_steps: int):
    """Same leading spacing as DDIM; returned as int32 [steps]."""
    return ddim_timesteps(num_train_timesteps, num_inference_steps)


def dpm_solver_step(
    sched: DiffusionSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    x_t: jnp.ndarray,
    last_x0: jnp.ndarray | None,
    t_last: jnp.ndarray | None,
):
    """One DPM-Solver++(2M) step in x0-parameterization (Lu et al. 2022).

    Carries the previous step's x0 prediction for the 2nd-order update; pass
    ``last_x0=None`` (or t_last=None) for the first (1st-order) step.
    Returns ``(x_prev, x0)`` so the caller threads x0 through the loop.
    """
    acp = sched.alphas_cumprod
    x0, _ = pred_x0_eps(sched, model_out, x_t, t)

    def lam(tt):
        # final boundary (tt < 0): alpha=1, sigma=0 — lambda -> +inf, clamped
        # via the 1e-10 sigma floor to ~+23 so expm1(-h) saturates at -1 and
        # the final update lands EXACTLY on x0 (diffusers semantics; an
        # earlier 1-1e-7 alpha clamp left a 0.77% eps residual in every
        # final latent — caught by the exact-oracle golden test)
        a = acp[jnp.maximum(tt, 0)]
        a = jnp.where(tt >= 0, a, jnp.float32(1.0))
        alpha = jnp.sqrt(a)
        sigma = jnp.sqrt(1.0 - a)
        return jnp.log(alpha) - jnp.log(jnp.maximum(sigma, 1e-10))

    lam_t, lam_prev = lam(t), lam(t_prev)
    h = lam_prev - lam_t

    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], jnp.float32(1.0))
    alpha_prev = jnp.sqrt(a_prev).reshape((-1,) + (1,) * (x_t.ndim - 1))
    sigma_prev = jnp.sqrt(1.0 - a_prev).reshape(alpha_prev.shape)
    a_t = acp[t]
    sigma_t = jnp.sqrt(1.0 - a_t).reshape(alpha_prev.shape)

    phi = jnp.expm1(-h).reshape(alpha_prev.shape)

    if last_x0 is None or t_last is None:
        d = x0
    else:
        h_last = lam_t - lam(t_last)
        r = h_last / jnp.maximum(h, 1e-10)
        d = (1.0 + 1.0 / (2.0 * r)).reshape(alpha_prev.shape) * x0 - (
            1.0 / (2.0 * r)
        ).reshape(alpha_prev.shape) * last_x0

    x_prev = (sigma_prev / jnp.maximum(sigma_t, 1e-10)) * x_t - alpha_prev * phi * d
    return x_prev, x0


# ---------------------------------------------------------------------------
# CFG helpers
# ---------------------------------------------------------------------------


def classifier_free_guidance(cond_out, uncond_out, scale):
    return uncond_out + scale * (cond_out - uncond_out)


def rescale_noise_cfg(noise_cfg, noise_cond, guidance_rescale: float = 0.0):
    """§3.4 of "Common Diffusion Noise Schedules..." (reference
    modeling_plugins.py:658-668): rescale CFG output std to the conditional's."""
    if guidance_rescale == 0.0:
        return noise_cfg
    axes = tuple(range(1, noise_cfg.ndim))
    std_cond = jnp.std(noise_cond, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_cond / jnp.maximum(std_cfg, 1e-8))
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg
