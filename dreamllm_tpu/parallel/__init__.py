from dreamllm_tpu.parallel.mesh import MeshConfig, create_mesh
from dreamllm_tpu.parallel.pipeline import pipeline_llama_forward
from dreamllm_tpu.parallel.sharding import (
    param_shardings,
    batch_shardings,
    shard_params,
)
