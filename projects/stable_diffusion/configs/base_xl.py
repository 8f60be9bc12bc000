"""Full-size plain SDXL fine-tune recipe — config-value parity with the
reference (projects/stable_diffusion/configs/base_xl.py:1): SDXL-base UNet
at 1024px on blip-laion + laion400m + laion-coco (8M/11M/11M), lr 1e-6
constant, wd 1e-2, per-device batch 32 × grad-accum 2, EMA OFF,
proportion_empty_prompts 0.2 (CFG uncond dropout), save every 2000 with a
10-checkpoint cap. The SDXL head carries the dual conditioning (per-token
ctx + pooled text_embeds), add_time_ids micro-conditioning, fp32-VAE policy
and the 0.13025 VAE scaling (models/sd/sdxl.py). bf16 on TPU replaces the
reference's fp16+tf32; use the fp16-fix VAE weights via convert/hf_sd.py."""

config = dict(
    run_dir="./runs/sdxl_base_ft",
    seed=0,
    head_type="sdxl",
    sd_head=dict(
        # SDXL-base architecture: sdxl_unet_config defaults (1024px-class)
        unet=dict(_target_="dreamllm_tpu.models.sd.unet.sdxl_unet_config"),
        vae=dict(
            _target_="dreamllm_tpu.models.sd.vae.VAEConfig",
            scaling_factor=0.13025,
        ),
        llm_hidden_size=2048,  # SDXL dual text-encoder concat width
        projector=dict(
            _target_="dreamllm_tpu.models.projector.ProjectorConfig",
            projector_type="linear", in_dim=2048, out_dim=2048,
        ),
        pooled_dim=1280,
        uncond_prob=0.2,   # reference proportion_empty_prompts=0.2
        noise_offset=0.0,
        input_perturbation=0.0,
        snr_gamma=None,
    ),
    cond_dim=2048,
    cond_len=77,
    use_ema=False,
    data=dict(
        datasets=["blip_laion", "laion400m", "laion_coco"],
        size_list=[8_000_000, 11_000_000, 11_000_000],
        batch_size=32,
        image_size_dm=1024,
    ),
    grad_accum=2,
    optimizer=dict(learning_rate=1e-6, schedule="constant", warmup_steps=0,
                   total_steps=468_750,  # 30M pairs / 64 per step, 1 epoch
                   weight_decay=1e-2, max_grad_norm=1.0),
    trainer=dict(max_steps=468_750, log_steps=50, save_steps=2000,
                 save_total_limit=10, val_steps=2000,
                 output_dir="./runs/sdxl_base_ft"),
    num_inference_steps=50,
    guidance_scale=5.0,
)
