"""E2E chain, stage 2 — interleaved pretraining with CHECKPOINT MIXING.

Mirrors projects/dreamllm/configs/stage2_interleaved.py (reference
configs/stage2/base.py:40-99, the mixing at :44-48): the dream queries +
SD projector come from the stage1_creation run dir, the vision projector
from stage1_comprehension; interleaved + pair data; everything unfrozen
except CLIP trunk / UNet / VAE.
"""

from projects.dreamllm.configs.e2e.common import (
    E2E_ROOT,
    data_common,
    model,
    sd_head,
    stage_dirs,
)

_dirs = stage_dirs("stage2")

config = dict(
    run_dir=_dirs["run_dir"],
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
        **data_common,
        datasets=["synthetic_interleaved", "synthetic_pairs"],
        ratios=[0.6, 0.4],
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
    # stage mixing from the two stage-1 runs (reference stage2/base.py:44-48)
    pretrained=dict(
        resume_plugins={
            "dream_embedding": E2E_ROOT + "/stage1_creation",
            "sd_head": E2E_ROOT + "/stage1_creation",
            "clip_vision_embedding": E2E_ROOT + "/stage1_comprehension",
        },
    ),
)
