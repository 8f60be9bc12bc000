from dreamllm_tpu.ops.norms import rms_norm, layer_norm, group_norm
from dreamllm_tpu.ops.rope import (
    RopeConfig,
    rope_cos_sin,
    apply_rope,
)
from dreamllm_tpu.ops.activations import swiglu, geglu, quick_gelu
from dreamllm_tpu.ops.attention import dot_product_attention, flash_attention
