"""DreamLLM-SDXL stage-1 creation-only pretraining.

Mirror of the reference's only published SDXL recipe
(projects/dreamllm_sdxl/configs/stage1/base.py): freeze LLM + embeddings +
CLIP trunk + SDXL UNet + VAE; train the dream queries + the SD projector
(+ the SDXL global/pooled projector, part of the sd_head subtree) on pair
data with diffusion loss only (loss_weight_lm=0, vm=1, :52-53); lr 2e-3,
cosine, bs 16/device (:75-78); laion400m+blip_laion creation-only
(:62-67).
"""

from projects.dreamllm_sdxl.configs.common import model, sd_head

config = dict(
    run_dir="./runs/dreamllm_sdxl_stage1_creation",
    seed=42,
    head_type="sdxl",
    model=dict(
        **model,
        loss_weight_lm=0.0,
        loss_weight_vm=1.0,
        frozen=(
            "llm",
            "clip_vision_embedding",  # trunk AND projector (base.py:30-32)
            "sd_head/unet",
            "sd_head/vae",
        ),
    ),
    sd_head=sd_head,
    data=dict(
        datasets=["laion400m", "blip_laion"],
        size_list=[20_000_000, 10_000_000],
        batch_size=16,
        max_images=1,
        max_dreams=1,
        max_seq_len=512,
        image_size=224,
        image_size_dm=1024,  # SDXL trains at 1024px
        i2t_probability=0.0,  # creation only (base.py:65-66)
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
        log_steps=10,
        save_steps=2000,
        val_steps=500,
        output_dir="./runs/dreamllm_sdxl_stage1_creation",
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="lmsys/vicuna-7b-v1.5",
    pretrained=dict(llm=None, clip=None, sd=None),  # HF/diffusers paths
)
