from dreamllm_tpu.utils.logging import setup_logger, get_logger
