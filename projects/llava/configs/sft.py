"""LLaVA SFT (reference projects/llava sft config): unfreeze the LLM, keep
the CLIP tower frozen; llava-instruct conversations."""

config = dict(
    run_dir="./runs/llava_sft",
    seed=42,
    model=dict(
        llm=dict(
            _target_="dreamllm_tpu.models.llama.LlamaConfig",
            vocab_size=32064, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            max_position_embeddings=2048,
        ),
        vision=dict(
            _target_="dreamllm_tpu.models.clip.CLIPVisionConfig",
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=336, patch_size=14,
        ),
        vision_projector=dict(
            _target_="dreamllm_tpu.models.projector.ProjectorConfig",
            projector_type="mlp", in_dim=1024, out_dim=4096, depth=2,
        ),
        n_dream_queries=0,
        image_embed_len=576,  # (336/14)^2
        loss_weight_lm=1.0,
        frozen=("clip_vision_embedding/clip",),
    ),
    data=dict(
        datasets=["llava_instruct"],
        size_list=[150_000],
        batch_size=16,
        max_images=2,
        max_dreams=0,
        i2t_probability=1.0,
    ),
    optimizer=dict(learning_rate=2e-5, schedule="cosine", warmup_steps=100,
                   total_steps=10000, max_grad_norm=1.0),
    trainer=dict(max_steps=10000, log_steps=20, save_steps=2000, val_steps=0,
                 output_dir="./runs/llava_sft"),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="lmsys/vicuna-7b-v1.1",
    pretrained=dict(resume_from="./runs/llava_pretrain"),
)
