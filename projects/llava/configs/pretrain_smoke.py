"""LLaVA pretrain smoke config: projector-only training on synthetic
conversations (offline-runnable scale model of projects/llava pretrain)."""

config = dict(
    run_dir="./runs/llava_smoke",
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
            projector_type="mlp", in_dim=32, out_dim=64, depth=2,
        ),
        n_dream_queries=0,
        image_embed_len=4,
        loss_weight_lm=1.0,
        frozen=("clip_vision_embedding/clip", "llm"),  # pretrain: projector only
    ),
    data=dict(
        datasets=["synthetic_pairs"],
        size_list=[64],
        batch_size=4,
        max_images=1,
        max_dreams=0,
        max_seq_len=64,
        image_size=16,
        image_size_dm=16,
        i2t_probability=1.0,  # comprehension only
    ),
    optimizer=dict(learning_rate=1e-3, schedule="cosine", warmup_steps=2,
                   total_steps=20, max_grad_norm=1.0),
    trainer=dict(max_steps=4, log_steps=2, save_steps=0, val_steps=0,
                 output_dir="./runs/llava_smoke"),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="toy",
)
