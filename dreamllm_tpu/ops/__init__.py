from dreamllm_tpu.ops.norms import rms_norm, layer_norm, group_norm
from dreamllm_tpu.ops.rope import (
    RopeConfig,
    rope_cos_sin,
    apply_rope,
)
from dreamllm_tpu.ops.activations import swiglu, geglu, quick_gelu
from dreamllm_tpu.ops.attention import dot_product_attention, flash_attention
from dreamllm_tpu.ops.quant import (
    QTensor,
    dequantize,
    quantize_int8,
    quantize_llama_params,
)
