from dreamllm_tpu.config.lazy import (
    LazyCall,
    LazyConfig,
    instantiate,
    deep_instantiate,
    locate,
)
from dreamllm_tpu.config.arg_parser import LazyArgumentParser, default_setup
