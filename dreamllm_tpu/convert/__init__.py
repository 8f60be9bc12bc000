from dreamllm_tpu.convert.hf_llama import (
    convert_llama_state_dict,
    llama_config_from_hf,
    resize_vocab_with_mean_init,
)
