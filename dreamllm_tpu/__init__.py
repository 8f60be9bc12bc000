"""dreamllm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal LLM framework.

A brand-new implementation of the capabilities of DreamLLM's "Omni" stack
(reference: RunpeiDong/DreamLLM): an LLM base (LLaMA/Vicuna decoder) plus
plugin modules — multimodal *embeddings* that inject tokens into the LLM input
(CLIP vision, learned dream queries) and *heads* that consume LLM hidden states
(Stable Diffusion 2.1 / SDXL) — connected by projectors.

Design stance (TPU-first, not a port):
  * pure-functional model core: ``init(rng, cfg) -> params`` pytrees +
    ``apply(params, ...)`` functions, fully jittable
  * plugins are pytree submodules with sharding & freezing *metadata* instead
    of runtime setattr + FSDP-ignore hacks
  * multimodal token splicing is a static-shape scatter by precomputed
    positions, so the whole forward stays compiled
  * one ``(data, fsdp, tp)`` mesh with NamedSharding replaces
    DDP/FSDP/DeepSpeed/pretraining_tp
  * Pallas flash-attention for the decoder hot loop; XLA fallback on CPU
"""

__version__ = "0.1.0"

# Public API surface (lazy-friendly: submodules import quickly; heavy deps
# like PIL/orbax load only when the relevant functions run).
from dreamllm_tpu.models.dreamllm import (  # noqa: E402,F401
    DreamLLMConfig,
    SpecialTokens,
    dreamllm_forward,
    encode_prompt_embeds,
    init_dreamllm_params,
    param_freeze_mask,
)
from dreamllm_tpu.models.llama import (  # noqa: E402,F401
    LlamaConfig,
    fuse_llama_params,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    llama_logits,
)
from dreamllm_tpu.generation import (  # noqa: E402,F401
    InterleavedConfig,
    SamplingConfig,
    generate_interleaved,
    generate_text,
)
from dreamllm_tpu.generation.sampler import beam_search  # noqa: E402,F401
from dreamllm_tpu.generation.chat import chat  # noqa: E402,F401
