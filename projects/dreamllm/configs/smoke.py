"""Tiny end-to-end smoke config — runs on CPU/one chip with synthetic data.
The offline-testable counterpart of the reference's "debug in output_dir"
convention (arg_parser.py:121-122)."""

config = dict(
    run_dir="./runs/smoke",
    seed=0,
    model=dict(
        llm=dict(
            _target_="dreamllm_tpu.models.llama.LlamaConfig",
            vocab_size=40000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        ),
        vision=dict(
            _target_="dreamllm_tpu.models.clip.CLIPVisionConfig",
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=8,
        ),
        vision_projector=dict(
            _target_="dreamllm_tpu.models.projector.ProjectorConfig",
            projector_type="linear", in_dim=32, out_dim=64,
        ),
        n_dream_queries=4,
        image_embed_len=4,
        loss_weight_lm=1.0,
        loss_weight_vm=1.0,
        frozen=("clip_vision_embedding/clip",),
    ),
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
        llm_hidden_size=64,
        projector=dict(
            _target_="dreamllm_tpu.models.projector.ProjectorConfig",
            projector_type="linear", in_dim=64, out_dim=24,
        ),
        uncond_prob=0.1,
    ),
    data=dict(
        datasets=["synthetic_pairs"],
        size_list=[64],
        batch_size=4,
        max_images=1,
        max_dreams=1,
        max_seq_len=64,
        image_size=16,
        image_size_dm=16,
    ),
    optimizer=dict(
        learning_rate=1e-3, schedule="constant", warmup_steps=0,
        total_steps=20, max_grad_norm=1.0,
    ),
    trainer=dict(
        max_steps=6, log_steps=2, save_steps=0, val_steps=0,
        output_dir="./runs/smoke",
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="toy",
    pretrained=dict(),
)
