"""Stage-2 pipeline-parallel variant: decoder layers staged over the mesh.

A capability BEYOND the reference (SURVEY §2.8: "PP — none"). The decoder's
layer stack is sharded into GPipe-style stages over the ``fsdp`` axis and
microbatches rotate through them via ppermute (parallel/pipeline.py), so a
model whose weights exceed one chip's HBM trains with each chip holding only
L/P layers — an alternative to FSDP gathering when per-layer weights are
large. Bubble fraction is (P-1)/(M+P-1); pipeline_microbatches >= the stage
count keeps it under 50%.
"""

from projects.dreamllm.configs.common import model, sd_head

model = dict(
    **model,
    loss_weight_lm=1.0,
    loss_weight_vm=1.0,
    frozen=(
        "clip_vision_embedding/clip",
        "sd_head/unet",
        "sd_head/vae",
    ),
    # stage the layer stack over the fsdp axis (make_train_step must get the
    # mesh); 8 microbatches over 4-8 stages keeps the bubble moderate
    pipeline_parallel_axis="fsdp",
    pipeline_microbatches=8,
)

config = dict(
    run_dir="./runs/dreamllm_stage2_pp",
    seed=42,
    model=model,
    sd_head=sd_head,
    data=dict(
        datasets=["mmc4_core", "blip_laion"],
        ratios=[0.6, 0.4],
        total_size=12_000_000,
        batch_size=16,          # must divide into pipeline_microbatches
        max_seq_len=2048,
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
        output_dir="./runs/dreamllm_stage2_pp",
    ),
    mesh=dict(data=1, fsdp=-1, tp=1),
    grad_accum=1,
    tokenizer="lmsys/vicuna-7b-v1.1",
    pretrained=dict(
        resume_plugins={
            "dream_embedding": "./runs/dreamllm_stage1_creation",
            "sd_head": "./runs/dreamllm_stage1_creation",
            "clip_vision_embedding": "./runs/dreamllm_stage1_comprehension",
        },
    ),
)
