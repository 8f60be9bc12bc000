"""SFT (reference configs/sft/base.py): llava-instruct + blip + mmc4-instruct
mixture, lr 4e-5."""

from projects.dreamllm.configs.common import model, sd_head

config = dict(
    run_dir="./runs/dreamllm_sft",
    seed=42,
    model=dict(
        **model,
        loss_weight_lm=1.0,
        loss_weight_vm=1.0,
        frozen=("clip_vision_embedding/clip", "sd_head/unet", "sd_head/vae"),
    ),
    sd_head=sd_head,
    data=dict(
        datasets=["llava_instruct", "blip_laion", "mmc4_instruct"],
        ratios=[0.5, 0.25, 0.25],
        total_size=2_000_000,
        batch_size=8,
        max_images=6,
        max_dreams=5,
    ),
    optimizer=dict(
        learning_rate=4e-5,
        schedule="cosine",
        warmup_steps=200,
        total_steps=12000,
        weight_decay=0.0,
        max_grad_norm=1.0,
    ),
    trainer=dict(
        max_steps=12000,
        log_steps=20,
        save_steps=2000,
        val_steps=1000,
        output_dir="./runs/dreamllm_sft",
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=2,
    tokenizer="lmsys/vicuna-7b-v1.1",
    pretrained=dict(resume_from="./runs/dreamllm_stage2"),
)
