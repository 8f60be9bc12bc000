"""Pipeline parallelism: GPipe-style SPMD schedule over the decoder stack.

Forward and gradient parity vs the plain scan-over-layers forward on the
virtual 8-device mesh (layers sharded into stages over `fsdp`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-suite only; fast tier: -m 'not slow'

from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward
from dreamllm_tpu.parallel import MeshConfig, create_mesh
from dreamllm_tpu.parallel.pipeline import pipeline_llama_forward

CFG = LlamaConfig(
    vocab_size=256, hidden_size=32, intermediate_size=64,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def setup():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    mesh = create_mesh(MeshConfig(data=2, fsdp=4, tp=1))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 256)
    return params, mesh, ids


@pytest.mark.parametrize("microbatches", [1, 2, 4])
def test_forward_parity(setup, microbatches):
    params, mesh, ids = setup
    ref = llama_forward(params, CFG, input_ids=ids, use_flash=False)[
        "last_hidden_state"
    ]
    out = pipeline_llama_forward(
        params, CFG, mesh, input_ids=ids, microbatches=microbatches
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_parity_packed_segments(setup):
    """Segment isolation and explicit positions flow through the stages."""
    params, mesh, ids = setup
    seg = jnp.asarray(np.repeat([[1, 2]], 8, axis=1).reshape(1, 16).repeat(4, 0))
    pos = jnp.concatenate(
        [jnp.arange(8), jnp.arange(8)]
    )[None].repeat(4, 0).astype(jnp.int32)
    ref = llama_forward(
        params, CFG, input_ids=ids, segment_ids=seg, positions=pos, use_flash=False
    )["last_hidden_state"]
    out = pipeline_llama_forward(
        params, CFG, mesh, input_ids=ids, segment_ids=seg, positions=pos,
        microbatches=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradient_parity(setup):
    """jax.grad through the pipeline (ppermute/psum transposes) matches the
    plain forward's gradients — PP is trainable, not a demo."""
    params, mesh, ids = setup

    def loss_pp(p):
        out = pipeline_llama_forward(p, CFG, mesh, input_ids=ids, microbatches=2)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def loss_ref(p):
        out = llama_forward(p, CFG, input_ids=ids, use_flash=False)[
            "last_hidden_state"
        ]
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_pp, _ = jax.tree_util.tree_flatten_with_path(g_pp)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    for (path, a), (_, b) in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_layer_count_must_divide(setup):
    params, mesh, ids = setup
    bad = LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_llama_forward(params, bad, mesh, input_ids=ids)


def test_train_step_pipeline_parallel():
    """make_train_step with cfg.pipeline_parallel_axis: one multimodal joint
    step runs through the staged decoder and matches the plain step."""
    import optax

    from dreamllm_tpu.models.clip import CLIPVisionConfig
    from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params
    from dreamllm_tpu.models.projector import ProjectorConfig
    from dreamllm_tpu.train.step import init_train_state, make_train_step

    mesh = create_mesh(MeshConfig(data=2, fsdp=4, tp=1))
    llm = LlamaConfig(
        vocab_size=40000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    vision = CLIPVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, image_size=8, patch_size=4,
    )
    common = dict(
        llm=llm, vision=vision,
        vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
        n_dream_queries=4, image_embed_len=4,
    )
    cfg_pp = DreamLLMConfig(**common, pipeline_parallel_axis="fsdp",
                            pipeline_microbatches=2)
    cfg_ref = DreamLLMConfig(**common)
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg_ref)

    rng = np.random.default_rng(9)
    ids = rng.integers(10, 1000, size=(4, 32))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(ids, jnp.int32),
    }
    tx = optax.sgd(1e-3)

    step_pp = make_train_step(
        cfg_pp, tx, head_in_params=False, use_flash=False,
        donate=False, mesh=mesh,
    )
    step_ref = make_train_step(
        cfg_ref, tx, head_in_params=False, use_flash=False, donate=False,
    )
    _, aux_pp = step_pp(init_train_state(params, tx), batch, jax.random.PRNGKey(1))
    _, aux_ref = step_ref(init_train_state(params, tx), batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(aux_pp["loss"]), float(aux_ref["loss"]), rtol=5e-4
    )
    np.testing.assert_allclose(
        float(aux_pp["grad_norm"]), float(aux_ref["grad_norm"]), rtol=5e-3
    )


def test_sp_and_pp_are_mutually_exclusive():
    from dreamllm_tpu.models.clip import CLIPVisionConfig
    from dreamllm_tpu.models.dreamllm import (
        DreamLLMConfig, dreamllm_forward, init_dreamllm_params,
    )
    from dreamllm_tpu.models.projector import ProjectorConfig

    mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
    cfg = DreamLLMConfig(
        llm=LlamaConfig(
            vocab_size=40000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128,
        ),
        vision=CLIPVisionConfig(
            hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=2, image_size=8, patch_size=4,
        ),
        vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
        n_dream_queries=4, image_embed_len=4,
        sequence_parallel_axis="fsdp", pipeline_parallel_axis="fsdp",
    )
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.ones((2, 16), jnp.int32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        dreamllm_forward(params, cfg, {"input_ids": ids, "labels": ids},
                         use_flash=False, mesh=mesh)
