"""E2E chain, stage 1a — creation-only pretraining at toy scale.

Mirrors projects/dreamllm/configs/stage1_creation.py (reference
configs/stage1/base.py:42-90): freeze LLM + CLIP + UNet + VAE; train the
dream queries + SD projector on pair data with diffusion loss only.
"""

from projects.dreamllm.configs.e2e.common import (
    data_common,
    model,
    sd_head,
    stage_dirs,
)

_dirs = stage_dirs("stage1_creation")

config = dict(
    run_dir=_dirs["run_dir"],
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
        **data_common,
        datasets=["synthetic_pairs"],
        size_list=[64],
        max_images=1,
        max_dreams=1,
        i2t_probability=0.0,  # creation only
    ),
    optimizer=dict(
        learning_rate=2e-3, schedule="constant", warmup_steps=0,
        total_steps=8, max_grad_norm=1.0,
    ),
    trainer=dict(
        max_steps=8, log_steps=1, save_steps=8, val_steps=0,
        output_dir=_dirs["output_dir"],
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="toy",
    pretrained=dict(),
)
