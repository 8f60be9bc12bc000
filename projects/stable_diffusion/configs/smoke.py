"""Tiny offline SD-training smoke config."""

config = dict(
    run_dir="./runs/sd_smoke",
    seed=0,
    sd_head=dict(
        unet=dict(
            _target_="dreamllm_tpu.models.sd.unet.UNetConfig",
            sample_size=8, block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, transformer_layers_per_block=(1, 1),
            num_attention_heads=(2, 4), cross_attention_dim=24,
            norm_num_groups=4,
        ),
        vae=dict(
            _target_="dreamllm_tpu.models.sd.vae.VAEConfig",
            block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
        ),
        llm_hidden_size=32,
        projector=dict(
            _target_="dreamllm_tpu.models.projector.ProjectorConfig",
            projector_type="linear", in_dim=32, out_dim=24,
        ),
        uncond_prob=0.1,
    ),
    cond_dim=32,
    cond_len=4,
    use_ema=True,
    data=dict(datasets=["synthetic_pairs"], size_list=[32], batch_size=4,
              image_size_dm=32),
    optimizer=dict(learning_rate=1e-4, schedule="constant", warmup_steps=0,
                   total_steps=10, max_grad_norm=1.0),
    trainer=dict(max_steps=4, log_steps=2, save_steps=0, val_steps=0,
                 output_dir="./runs/sd_smoke"),
    num_inference_steps=3,
)
