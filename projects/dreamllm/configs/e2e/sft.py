"""E2E chain, stage 3 — SFT at toy scale.

Mirrors projects/dreamllm/configs/sft.py (reference configs/sft/base.py):
resume whole-model from the stage-2 run, train on a conversation +
instruct-interleaved + pair mixture. NEFTune is enabled here (the
reference wires neftune_noise_alpha through TrainingArguments for the SFT
recipes, trainer_utils.py:106-130) so the chain exercises it through the
real CLI.
"""

from projects.dreamllm.configs.e2e.common import (
    E2E_ROOT,
    data_common,
    model,
    sd_head,
    stage_dirs,
)

_dirs = stage_dirs("sft")

config = dict(
    run_dir=_dirs["run_dir"],
    seed=42,
    model=dict(
        **model,
        loss_weight_lm=1.0,
        loss_weight_vm=1.0,
        neftune_noise_alpha=5.0,
        frozen=("clip_vision_embedding/clip", "sd_head/unet", "sd_head/vae"),
    ),
    sd_head=sd_head,
    data=dict(
        **data_common,
        datasets=["synthetic_conversation", "synthetic_instruct", "synthetic_pairs"],
        ratios=[0.5, 0.25, 0.25],
        total_size=64,
        max_images=2,
        max_dreams=2,
    ),
    optimizer=dict(
        learning_rate=1e-3, schedule="constant", warmup_steps=0,
        total_steps=8, max_grad_norm=1.0,
    ),
    trainer=dict(
        max_steps=8, log_steps=1, save_steps=8, val_steps=0,
        output_dir=_dirs["output_dir"],
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="toy",
    pretrained=dict(resume_from=E2E_ROOT + "/stage2"),
)
