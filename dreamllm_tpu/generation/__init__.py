from dreamllm_tpu.generation.sampler import (
    SamplingConfig,
    generate_text,
    sample_token,
    sample_token_per_row,
)
from dreamllm_tpu.generation.interleaved import (
    InterleavedConfig,
    generate_interleaved,
)
