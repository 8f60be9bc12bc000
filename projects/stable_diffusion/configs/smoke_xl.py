"""Tiny offline SDXL-training smoke config (head_type="sdxl": dual
conditioning + add_time_ids + fp32 VAE — the scale model of base_xl.py)."""

config = dict(
    run_dir="./runs/sdxl_smoke",
    seed=0,
    head_type="sdxl",
    sd_head=dict(
        unet=dict(
            _target_="dreamllm_tpu.models.sd.unet.sdxl_unet_config",
            sample_size=8, block_out_channels=(16, 32),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1, transformer_layers_per_block=(1, 1),
            num_attention_heads=(2, 4), cross_attention_dim=24,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=8 * 6 + 16,  # 6 ids + pooled 16
            norm_num_groups=4,
        ),
        vae=dict(
            _target_="dreamllm_tpu.models.sd.vae.VAEConfig",
            block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
            scaling_factor=0.13025,
        ),
        llm_hidden_size=32,
        projector=dict(
            _target_="dreamllm_tpu.models.projector.ProjectorConfig",
            projector_type="linear", in_dim=32, out_dim=24,
        ),
        pooled_dim=16,
        uncond_prob=0.2,  # base_xl proportion_empty_prompts parity
    ),
    cond_dim=32,
    cond_len=4,
    use_ema=False,  # base_xl: use_ema=False
    data=dict(datasets=["synthetic_pairs"], size_list=[32], batch_size=2,
              image_size_dm=32),
    optimizer=dict(learning_rate=1e-4, schedule="constant", warmup_steps=0,
                   total_steps=10, max_grad_norm=1.0),
    trainer=dict(max_steps=3, log_steps=2, save_steps=0, val_steps=0,
                 output_dir="./runs/sdxl_smoke"),
    num_inference_steps=2,
)
