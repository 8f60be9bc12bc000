"""Shared toy-scale pieces for the chained end-to-end recipe configs.

These four configs (stage1_creation -> stage1_comprehension -> stage2 -> sft)
mirror the reference's documented 4-recipe workflow
(projects/dreamllm/README.md:21-27 + scripts/train/dreamllm/*.sh + the
checkpoint mixing of configs/stage2/base.py:44-48) at a scale that runs on
CPU in seconds per stage, entirely through the REAL CLI entry points —
`scripts/e2e_recipe.sh` / `tests/test_e2e_recipe.py` chain them.

`DREAMLLM_E2E_ROOT` points every stage's run/output dir into one root so the
chain is relocatable (tests use a tmp dir); stage2/sft resolve their
stage-mix checkpoint paths from the same root.
"""

import os

E2E_ROOT = os.environ.get("DREAMLLM_E2E_ROOT", "./runs/e2e")

# the smoke-scale model (projects/dreamllm/configs/smoke.py shapes): big
# enough to exercise every subsystem, small enough for seconds-per-stage
model = dict(
    llm=dict(
        _target_="dreamllm_tpu.models.llama.LlamaConfig",
        vocab_size=40000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    ),
    vision=dict(
        _target_="dreamllm_tpu.models.clip.CLIPVisionConfig",
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=16, patch_size=8,
    ),
    vision_projector=dict(
        _target_="dreamllm_tpu.models.projector.ProjectorConfig",
        projector_type="linear", in_dim=32, out_dim=64,
    ),
    n_dream_queries=4,
    image_embed_len=4,
)

sd_head = dict(
    unet=dict(
        _target_="dreamllm_tpu.models.sd.unet.UNetConfig",
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, transformer_layers_per_block=(1, 1),
        num_attention_heads=(2, 4), cross_attention_dim=24,
        norm_num_groups=4,
    ),
    vae=dict(
        _target_="dreamllm_tpu.models.sd.vae.VAEConfig",
        block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    ),
    llm_hidden_size=64,
    projector=dict(
        _target_="dreamllm_tpu.models.projector.ProjectorConfig",
        projector_type="linear", in_dim=64, out_dim=24,
    ),
    uncond_prob=0.1,
)

data_common = dict(
    batch_size=4,
    max_seq_len=64,
    image_size=16,
    image_size_dm=16,
)


def stage_dirs(stage: str) -> dict:
    """run_dir + trainer output_dir for one stage under the e2e root."""
    return dict(
        run_dir=os.path.join(E2E_ROOT, stage, "logs"),
        output_dir=os.path.join(E2E_ROOT, stage),
    )
