"""Full-size plain SD-2.1 fine-tune recipe — config-value parity with the
reference (projects/stable_diffusion/configs/base.py:1): SD-2.1-base UNet at
512px on blip-laion + laion400m + laion-coco (8M/11M/11M), lr 5e-5 constant,
wd 1e-2, per-device batch 32 × grad-accum 2, EMA on, save every 2000 with a
10-checkpoint cap. bf16 on TPU replaces the reference's fp16+tf32. Weights
come from the HF converter (convert/hf_sd.py) rather than random init when
available; the caption encoder is external to this project (reference uses
the frozen SD text encoder — plug its embeddings into the cond stream)."""

config = dict(
    run_dir="./runs/sd21_base_ft",
    seed=0,
    sd_head=dict(
        # SD-2.1-base architecture: defaults of UNetConfig/VAEConfig
        unet=dict(_target_="dreamllm_tpu.models.sd.unet.UNetConfig"),
        vae=dict(_target_="dreamllm_tpu.models.sd.vae.VAEConfig"),
        llm_hidden_size=1024,  # SD-2.1 text-encoder width feeds the cond stream
        projector=dict(
            _target_="dreamllm_tpu.models.projector.ProjectorConfig",
            projector_type="linear", in_dim=1024, out_dim=1024,
        ),
        uncond_prob=0.1,
        noise_offset=0.0,
        input_perturbation=0.0,
        snr_gamma=None,
    ),
    cond_dim=1024,
    cond_len=77,
    use_ema=True,
    data=dict(
        datasets=["blip_laion", "laion400m", "laion_coco"],
        size_list=[8_000_000, 11_000_000, 11_000_000],
        batch_size=32,
        image_size_dm=512,
    ),
    grad_accum=2,
    optimizer=dict(learning_rate=5e-5, schedule="constant", warmup_steps=0,
                   total_steps=937_500,  # 30M pairs / (32*2) per step, 1 epoch
                   weight_decay=1e-2, max_grad_norm=1.0),
    trainer=dict(max_steps=937_500, log_steps=50, save_steps=2000,
                 save_total_limit=10, val_steps=2000,
                 output_dir="./runs/sd21_base_ft"),
    num_inference_steps=50,
    guidance_scale=7.5,
)
