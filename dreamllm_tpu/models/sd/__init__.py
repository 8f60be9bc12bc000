from dreamllm_tpu.models.sd.schedulers import (
    DiffusionSchedule,
    make_schedule,
    add_noise,
    get_velocity,
    ddim_timesteps,
    ddim_step,
    ddpm_step,
    dpm_solver_timesteps,
    dpm_solver_step,
)
from dreamllm_tpu.models.sd.vae import (
    VAEConfig,
    init_vae_params,
    vae_encode,
    vae_decode,
    vae_sample,
)
from dreamllm_tpu.models.sd.unet import (
    UNetConfig,
    init_unet_params,
    unet_forward,
)
