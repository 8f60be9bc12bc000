"""E2E chain, stage 1b — comprehension-only pretraining at toy scale.

Mirrors projects/dreamllm/configs/stage1_comprehension.py (reference
configs/stage1/vicuna11_7b_llavapretran_comprehension_only.py): freeze
LLM + CLIP + dream queries + SD head; train the vision projector on pair
data with LM loss only.
"""

from projects.dreamllm.configs.e2e.common import (
    data_common,
    model,
    sd_head,
    stage_dirs,
)

_dirs = stage_dirs("stage1_comprehension")

config = dict(
    run_dir=_dirs["run_dir"],
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
        **data_common,
        datasets=["synthetic_pairs"],
        size_list=[64],
        max_images=1,
        max_dreams=0,
        i2t_probability=1.0,  # comprehension only
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
