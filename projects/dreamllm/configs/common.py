"""Shared model recipes (reference projects/dreamllm/configs/common.py):
plugin definitions as LazyCall dicts, serialized into checkpoints so they are
self-describing."""

from dreamllm_tpu.config import LazyCall

# DreamLLM-7B: Vicuna-7B decoder + CLIP-L/14 + SD-2.1 head
model = dict(
    llm=LazyCall("dreamllm_tpu.models.llama.LlamaConfig")(
        vocab_size=32064,  # 32000 + special tokens, padded
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=32,
        num_attention_heads=32,
        max_position_embeddings=2048,
    ),
    vision=LazyCall("dreamllm_tpu.models.clip.CLIPVisionConfig")(
        hidden_size=1024,
        intermediate_size=4096,
        num_hidden_layers=24,
        num_attention_heads=16,
        image_size=224,
        patch_size=14,
    ),
    vision_projector=LazyCall("dreamllm_tpu.models.projector.ProjectorConfig")(
        projector_type="linear", in_dim=1024, out_dim=4096,
    ),
    n_dream_queries=64,
    image_embed_len=256,
)

sd_head = dict(
    unet=LazyCall("dreamllm_tpu.models.sd.unet.UNetConfig")(),  # SD 2.1 base
    vae=LazyCall("dreamllm_tpu.models.sd.vae.VAEConfig")(),
    llm_hidden_size=4096,
    projector=LazyCall("dreamllm_tpu.models.projector.ProjectorConfig")(
        projector_type="linear", in_dim=4096, out_dim=1024,
    ),
    uncond_prob=0.1,
)
