"""Stage-2 interleaved pretraining (reference configs/stage2/base.py:40-99):
MMC4 + pair data, everything unfrozen except VAE/UNet/CLIP; lr 2e-5; param
sharding over the fsdp axis (replaces FSDP shard_grad_op auto_wrap)."""

from projects.dreamllm.configs.common import model, sd_head

config = dict(
    run_dir="./runs/dreamllm_stage2",
    seed=42,
    model=dict(
        **model,
        loss_weight_lm=1.0,
        loss_weight_vm=1.0,
        frozen=(
            "clip_vision_embedding/clip",
            "sd_head/unet",
            "sd_head/vae",
        ),
    ),
    sd_head=sd_head,
    data=dict(
        datasets=["mmc4_core", "blip_laion"],
        ratios=[0.6, 0.4],
        total_size=12_000_000,
        batch_size=8,
        max_images=6,
        max_dreams=5,
    ),
    optimizer=dict(
        learning_rate=2e-5,
        schedule="cosine",
        warmup_steps=500,
        total_steps=40000,
        weight_decay=0.0,
        max_grad_norm=1.0,
    ),
    trainer=dict(
        max_steps=40000,
        log_steps=20,
        save_steps=2000,
        val_steps=1000,
        output_dir="./runs/dreamllm_stage2",
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=2,
    tokenizer="lmsys/vicuna-7b-v1.1",
    # stage mixing: point plugins at the two stage-1 run dirs
    # (reference configs/stage2/base.py:44-48)
    pretrained=dict(
        resume_plugins={
            "dream_embedding": "./runs/dreamllm_stage1_creation",
            "sd_head": "./runs/dreamllm_stage1_creation",
            "clip_vision_embedding": "./runs/dreamllm_stage1_comprehension",
        },
    ),
)
