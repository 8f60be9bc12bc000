"""Shared DreamLLM-SDXL model recipe (reference
projects/dreamllm_sdxl/configs/common.py): Vicuna-7B-v1.5 decoder +
CLIP-L/14 vision (2-layer MLP projector, reference stage1/base.py:40-42)
+ SDXL-base head with the global (pooled) projector."""

from dreamllm_tpu.config import LazyCall

# DreamLLM-SDXL-7B: Vicuna-7B-v1.5 (4096 ctx) + CLIP-L/14 + SDXL-base head
model = dict(
    llm=LazyCall("dreamllm_tpu.models.llama.LlamaConfig")(
        vocab_size=32064,  # 32000 + special tokens, padded
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=32,
        num_attention_heads=32,
        max_position_embeddings=4096,  # vicuna-7b-v1.5 (stage1/base.py:19-23)
    ),
    vision=LazyCall("dreamllm_tpu.models.clip.CLIPVisionConfig")(
        hidden_size=1024,
        intermediate_size=4096,
        num_hidden_layers=24,
        num_attention_heads=16,
        image_size=224,
        patch_size=14,
    ),
    # reference stage1/base.py:41-42: projector_type="mlp", depth=2
    vision_projector=LazyCall("dreamllm_tpu.models.projector.ProjectorConfig")(
        projector_type="mlp", depth=2, in_dim=1024, out_dim=4096,
    ),
    n_dream_queries=196,  # common.py:21 num_dream_queries=196 (vs 64 for SD2.1)
    image_embed_len=256,
)

sd_head = dict(
    unet=LazyCall("dreamllm_tpu.models.sd.unet.sdxl_unet_config")(),  # SDXL-base
    # SDXL's VAE uses scaling_factor 0.13025 (not the SD-2.1 0.18215)
    vae=LazyCall("dreamllm_tpu.models.sd.vae.VAEConfig")(scaling_factor=0.13025),
    llm_hidden_size=4096,
    projector=LazyCall("dreamllm_tpu.models.projector.ProjectorConfig")(
        projector_type="linear", in_dim=4096, out_dim=2048,
    ),
    pooled_dim=1280,
    uncond_prob=0.1,
)
