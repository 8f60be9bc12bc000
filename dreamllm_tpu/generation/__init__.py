from dreamllm_tpu.generation.sampler import (
    SamplingConfig,
    generate_text,
    sample_token,
)
from dreamllm_tpu.generation.interleaved import (
    InterleavedConfig,
    generate_interleaved,
)
