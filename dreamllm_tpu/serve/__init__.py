from dreamllm_tpu.serve.server import ModelServer, OnlineClient
