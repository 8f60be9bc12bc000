"""Stage-1 creation-only pretraining (reference configs/stage1/base.py:42-90):
freeze LLM + embeddings + CLIP + VAE + UNet; train dream queries + SD
projector; loss_weight_lm=0, vm=1; lr 2e-3."""

from projects.dreamllm.configs.common import model, sd_head

config = dict(
    run_dir="./runs/dreamllm_stage1_creation",
    seed=42,
    model=dict(
        **model,
        loss_weight_lm=0.0,
        loss_weight_vm=1.0,
        frozen=(
            "llm",
            "clip_vision_embedding",
            "sd_head/unet",
            "sd_head/vae",
        ),
    ),
    sd_head=sd_head,
    data=dict(
        datasets=["laion400m", "laion_coco"],
        ratios=[0.5, 0.5],
        total_size=2_000_000,
        batch_size=16,
        max_images=1,
        max_dreams=1,
        i2t_probability=0.0,  # creation only
    ),
    optimizer=dict(
        learning_rate=2e-3,
        schedule="cosine",
        warmup_steps=200,
        total_steps=8000,
        weight_decay=0.0,
        max_grad_norm=1.0,
    ),
    trainer=dict(
        max_steps=8000,
        log_steps=20,
        save_steps=1000,
        val_steps=500,
        output_dir="./runs/dreamllm_stage1_creation",
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="lmsys/vicuna-7b-v1.1",
    pretrained=dict(llm=None, clip=None, sd=None),  # HF/diffusers paths
)
