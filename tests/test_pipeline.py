"""Pipeline parallelism: GPipe-style SPMD schedule over the decoder stack.

Forward and gradient parity vs the plain scan-over-layers forward on the
virtual 8-device mesh (layers sharded into stages over `fsdp`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
