from dreamllm_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_forward,
    llama_logits,
    init_kv_cache,
)
