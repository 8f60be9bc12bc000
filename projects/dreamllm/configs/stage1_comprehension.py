"""Stage-1 comprehension-only pretraining (reference
configs/stage1/vicuna11_7b_llavapretran_comprehension_only.py): freeze LLM +
CLIP; train the vision projector on pair data; LM loss only."""

from projects.dreamllm.configs.common import model, sd_head

config = dict(
    run_dir="./runs/dreamllm_stage1_comprehension",
    seed=42,
    model=dict(
        **model,
        loss_weight_lm=1.0,
        loss_weight_vm=0.0,
        frozen=(
            "llm",
            "clip_vision_embedding/clip",
            "dream_embedding",
            "sd_head",
        ),
    ),
    sd_head=sd_head,
    data=dict(
        datasets=["blip_laion"],
        size_list=[558_000],
        batch_size=16,
        max_images=1,
        max_dreams=0,
        i2t_probability=1.0,  # comprehension only
    ),
    optimizer=dict(
        learning_rate=2e-3,
        schedule="cosine",
        warmup_steps=200,
        total_steps=4000,
        weight_decay=0.0,
        max_grad_norm=1.0,
    ),
    trainer=dict(
        max_steps=4000, log_steps=20, save_steps=1000, val_steps=0,
        output_dir="./runs/dreamllm_stage1_comprehension",
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="lmsys/vicuna-7b-v1.1",
    pretrained=dict(),
)
