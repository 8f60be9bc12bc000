"""Serving entry point: launch a ModelServer from a config + checkpoint.

TPU-native equivalent of the reference's serving shim CLI
(omni/eval/language_eval llama_evaluation_main tools/serve.py — a FastAPI
process wrapping one model), upgraded to this framework's serving stack:
continuous batching with prefix caching and SSE streaming, /logprob for
the online evaluators, and (with a vision tower in the config) multimodal
/chat through the engine's embeds lanes.

    # zero-download smoke (random params unless checkpoint= resolves)
    python -m projects.dreamllm.serve --config_file \
        projects/dreamllm/configs/smoke.py +port=8300

    # serve a trained run, int8 weights, 8 lanes, prefix cache for 2
    # system prompts
    python -m projects.dreamllm.serve --config_file <cfg> \
        checkpoint=runs/stage2 +quantize=int8 +slots=8 +max_len=2048 \
        +prefill_len=512 +prefix_cache_entries=2

    # additionally let /chat answer WITH images (loads the SD(XL) head and
    # routes image turns through the interleaved <dream_start> path)
    python -m projects.dreamllm.serve --config_file <cfg> \
        checkpoint=runs/stage2 +chat_images=1 +image_steps=50

Endpoints (serve/server.py): POST /generate (stream=true → SSE),
POST /logprob, POST /chat (multimodal, engine-batched), GET /health.
"""

from __future__ import annotations

import jax

from dreamllm_tpu.config import LazyArgumentParser, default_setup
from dreamllm_tpu.generation.sampler import SamplingConfig
from dreamllm_tpu.serve import ContinuousBatchingEngine, EngineConfig, ModelServer
from dreamllm_tpu.train.checkpoints import latest_checkpoint, load_params
from dreamllm_tpu.utils.logging import get_logger

from projects.dreamllm.train import build_model_cfg, make_tokenizer

logger = get_logger("projects.dreamllm.serve")


def build_server(config) -> ModelServer:
    """Config → ready-to-start ModelServer (exposed for tests)."""
    cfg, head_cfg = build_model_cfg(config)
    tokenizer = make_tokenizer(config, cfg)
    from dreamllm_tpu.models.dreamllm import init_dreamllm_params

    params = jax.jit(lambda r: init_dreamllm_params(r, cfg))(jax.random.PRNGKey(0))
    # +chat_images=1: serve /chat with image OUTPUT — the SD(XL) head rides
    # the interleaved <dream_start> path (generation/chat.py). The head is
    # initialized BEFORE the checkpoint overlay so a trained sd_head item
    # loads into it.
    chat_images = bool(config.get("chat_images", False)) and config.get("chat", True)
    if chat_images:
        if config.get("head_type", "sd") == "sdxl":
            from dreamllm_tpu.models.sd.sdxl import init_sdxl_head_params as _init_head
        else:
            from dreamllm_tpu.models.sd.head import init_sd_head_params as _init_head

        params["sd_head"] = jax.jit(
            lambda r: _init_head(r, head_cfg)
        )(jax.random.PRNGKey(1))
    ck = latest_checkpoint(config.get("checkpoint", config["trainer"]["output_dir"]))
    if ck:
        loaded = load_params(ck)
        for k in params:
            if k in loaded:
                params[k] = loaded[k]
        logger.info("serving %s", ck)
        if chat_images and "sd_head" not in loaded:
            logger.warning(
                "chat_images=1 but checkpoint %s has no 'sd_head' item — "
                "image output will use RANDOM diffusion-head params", ck,
            )
    else:
        logger.warning("no checkpoint found — serving random params")

    llm_params = params["llm"]
    quant = config.get("quantize")
    if quant == "int8":
        from dreamllm_tpu.models.llama import fuse_llama_params
        from dreamllm_tpu.ops.quant import quantize_llama_params

        llm_params = jax.jit(
            lambda p: quantize_llama_params(fuse_llama_params(p))
        )(llm_params)
    elif quant == "int4":
        from dreamllm_tpu.ops.quant4 import quantize_llama_params_int4

        llm_params = jax.jit(quantize_llama_params_int4)(llm_params)
    elif quant:
        raise ValueError(f"quantize must be int8 or int4, got {quant!r}")

    st = cfg.special_tokens
    scfg = SamplingConfig(greedy=True, max_new_tokens=0,
                          eos_token_id=st.eos, pad_token_id=0)
    ecfg = EngineConfig(
        slots=config.get("slots", 8),
        prefill_len=config.get("prefill_len", 512),
        max_len=config.get("max_len", 1024),
        chunk_steps=config.get("chunk_steps", 16),
        cache_dtype=config.get("cache_dtype", "bfloat16"),
        prefix_cache_entries=config.get("prefix_cache_entries", 0),
        bos_token_id=st.bos,
    )
    # params with quantized/fused decode weights serve the engine; the
    # FULL tree (vision tower, original embeddings) backs multimodal chat
    engine = ContinuousBatchingEngine(llm_params, cfg.llm, scfg, ecfg)

    chat_fn = None
    if config.get("chat", True):
        from dreamllm_tpu.generation.chat import make_chat_fn

        chat_params = dict(params, llm=dict(params["llm"]))
        icfg = None
        if chat_images:
            from dreamllm_tpu.generation.interleaved import InterleavedConfig

            icfg = InterleavedConfig(
                max_new_tokens=config.get("max_new_tokens_limit", 1024),
                max_images=config.get("chat_max_images", 2),
                num_inference_steps=config.get("image_steps", 50),
                guidance_scale=config.get("guidance_scale", 3.5),
            )
        chat_fn = make_chat_fn(
            chat_params, cfg, tokenizer,
            head_params=params.get("sd_head") if chat_images else None,
            head_cfg=head_cfg if chat_images else None,
            interleaved=icfg,
            max_new_tokens_limit=config.get("max_new_tokens_limit", 1024),
        )
        # NOTE: chat uses the locked in-process path (full bf16 tree) —
        # engine-routed chat needs the engine and the embedding weights to
        # agree, which quantized+fused decode params do not guarantee for
        # the splice; text /generate rides the engine regardless.

    from dreamllm_tpu.eval.nlp import choice_logprobs

    def logprob_fn(context, continuations):
        return choice_logprobs(params["llm"], cfg.llm, tokenizer, context,
                               list(continuations))

    engine.warmup()
    return ModelServer(
        logprob_fn=logprob_fn,
        host=config.get("host", "127.0.0.1"),
        port=config.get("port", 8300),
        engine=engine,
        tokenizer=tokenizer,
        chat_fn=chat_fn,
    )


def main(argv=None):
    args, config = LazyArgumentParser().parse(argv)
    default_setup(args, config)
    server = build_server(config)
    logger.info("listening on %s:%d", server.host, server.port)
    try:
        server.start(background=False)
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
