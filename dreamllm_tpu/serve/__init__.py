from dreamllm_tpu.serve.server import ModelServer, OnlineClient
from dreamllm_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

__all__ = ["ModelServer", "OnlineClient", "ContinuousBatchingEngine", "EngineConfig"]
