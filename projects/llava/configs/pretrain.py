"""LLaVA-1.5 stage-1 feature alignment, full size — config-value parity with
the reference (projects/llava/configs/stage1/vicuna15_7b_llava15.py:1):
Vicuna-7B-v1.5 + CLIP ViT-L/14-336 (select_layer -2), 2-layer MLP projector,
EVERYTHING frozen except the projector, lr 2e-3 cosine (warmup_ratio 3e-3),
per-device batch 16, 1 epoch of llava_pretrain (558K), save 2000 / keep 3.
bf16 on TPU replaces the reference's bf16+tf32; gradient checkpointing via
remat in the train step."""

_STEPS = 558_000 // 16  # 1 epoch at per-device batch 16 (34,875 steps)

config = dict(
    run_dir="./runs/llava_pretrain",
    seed=42,
    model=dict(
        llm=dict(
            _target_="dreamllm_tpu.models.llama.LlamaConfig",
            vocab_size=32064, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            max_position_embeddings=4096,  # vicuna-7b-v1.5
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
        loss_weight_vm=0.0,
        # stage 1: projector-only (reference freezes embed_tokens, the LM,
        # lm_head, and the whole CLIP tower incl. embeddings)
        frozen=("clip_vision_embedding/clip", "llm"),
    ),
    data=dict(
        datasets=["llava_pretrain"],
        size_list=[558_000],
        batch_size=16,
        max_images=1,
        max_dreams=0,
        i2t_probability=1.0,  # comprehension only
    ),
    optimizer=dict(learning_rate=2e-3, schedule="cosine",
                   warmup_steps=int(_STEPS * 3e-3) + 1,  # warmup_ratio 3e-3
                   total_steps=_STEPS, max_grad_norm=1.0),
    trainer=dict(max_steps=_STEPS, log_steps=10, save_steps=2000,
                 save_total_limit=3, val_steps=0,
                 output_dir="./runs/llava_pretrain"),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="lmsys/vicuna-7b-v1.5",
)
