"""First-inf/nan locator (utils/debug_overflow.py) — the reference's
DebugUnderflowOverflow hookup (trainer.py:519-528) as a jit-compatible
post-mortem."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params
from dreamllm_tpu.models.llama import LlamaConfig
from dreamllm_tpu.models.projector import ProjectorConfig
from dreamllm_tpu.utils.debug_overflow import format_report, locate_overflow

CFG = DreamLLMConfig(
    llm=LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=3, num_attention_heads=2,
                    num_key_value_heads=2, max_position_embeddings=64,
                    dtype=jnp.float32),
    vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=8, patch_size=4),
    vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
    n_dream_queries=4, image_embed_len=4,
)


def _batch(with_images=False):
    ids = jnp.asarray([[1, 5, 9, 20, 30, 40, 50, 2]], jnp.int32)
    b = {"input_ids": ids}
    if with_images:
        b["images"] = jnp.zeros((1, 1, 8, 8, 3), jnp.float32)
        b["image_positions"] = jnp.asarray([[2]], jnp.int32)
    return b


def test_healthy_model_reports_all_finite():
    params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
    res = locate_overflow(params, CFG, _batch(with_images=True))
    assert res["first_nonfinite"] is None
    names = [s.name for s in res["stats"]]
    assert names[0] == "embed_tokens"
    assert "clip_vision_embedding+projector" in names
    assert "decoder_layer_0" in names and names[-1] == "lm_head"
    assert all(s.finite for s in res["stats"])
    assert "first non-finite module: -" in format_report(res)


def test_locates_first_poisoned_layer():
    params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
    # poison decoder layer 1's MLP down-projection with a NaN weight: layer
    # 0's output stays clean, everything from layer 1 on is contaminated
    stack = params["llm"]["layers"]

    def poison(x):
        if x.ndim >= 2 and x.shape[0] == CFG.llm.num_hidden_layers:
            arr = np.array(x, np.float32)  # writable copy
            arr[1].flat[0] = np.nan
            return jnp.asarray(arr, x.dtype)
        return x

    params["llm"]["layers"] = jax.tree.map(poison, stack)
    res = locate_overflow(params, CFG, _batch())
    assert res["first_nonfinite"] == "decoder_layer_1"
    report = format_report(res)
    assert "decoder_layer_1" in report


def test_saturation_threshold():
    params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
    res = locate_overflow(params, CFG, _batch(), saturate_at=1e-12)
    # everything exceeds an absurdly low threshold; first module wins
    assert res["first_saturating"] == "embed_tokens"
