"""Stage-2 long-context variant: ring attention (sequence parallelism).

A capability BEYOND the reference (SURVEY §5.7: the reference is hard-capped
at 2048 tokens, modeling_dreamllm.py:1368-1371; its only long-context lever is
RoPE scaling). Here the sequence is sharded over the ``fsdp`` mesh axis and
attention runs as a K/V ring over the ICI (parallel/ring.py), so per-step
context scales linearly with the number of chips: 8×v5e at 2048/chip = 16k
tokens per sequence, with RoPE dynamic-NTK extending the position range.
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
    # ring the sequence over the fsdp axis (make_train_step must get the mesh)
    sequence_parallel_axis="fsdp",
)
# dict-literal merge: these keys OVERRIDE common's llm values (dict(**d, k=v)
# would raise on the duplicate max_position_embeddings)
model["llm"] = {
    **model["llm"],
    "max_position_embeddings": 16384,
    "rope_scaling_type": "dynamic",
    "rope_scaling_factor": 8.0,
}

config = dict(
    run_dir="./runs/dreamllm_stage2_long",
    seed=42,
    model=model,
    sd_head=sd_head,
    data=dict(
        datasets=["mmc4_core", "blip_laion"],
        ratios=[0.6, 0.4],
        total_size=12_000_000,
        batch_size=1,          # long sequences: batch via packing instead
        max_seq_len=16384,
        max_images=24,
        max_dreams=20,
        pack=True,
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
        output_dir="./runs/dreamllm_stage2_long",
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
