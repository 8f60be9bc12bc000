"""Ring attention over an 8-device CPU mesh vs single-device full attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.ops.attention import dot_product_attention
from dreamllm_tpu.parallel import MeshConfig, create_mesh
from dreamllm_tpu.parallel.ring import ring_self_attention

pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices"),
              pytest.mark.slow]  # full-suite only; fast tier: -m 'not slow'


def make_qkv(b=2, s=64, hq=4, hkv=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    return q, k, v


class TestRingAttention:
    def test_causal_matches_full(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        q, k, v = make_qkv()
        ref = dot_product_attention(q, k, v, causal=True)
        got = ring_self_attention(q, k, v, mesh, axis="fsdp", causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_non_causal_matches_full(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        q, k, v = make_qkv(seed=1)
        ref = dot_product_attention(q, k, v, causal=False)
        got = ring_self_attention(q, k, v, mesh, axis="fsdp", causal=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_packed_segments(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        q, k, v = make_qkv(b=1, s=64, seed=2)
        seg = np.zeros((1, 64), np.int32)
        seg[0, :30] = 1
        seg[0, 30:50] = 2  # trailing 14 = padding (id 0)
        ref = dot_product_attention(q, k, v, causal=True, segment_ids=jnp.asarray(seg))
        got = ring_self_attention(q, k, v, mesh, axis="fsdp", causal=True,
                                  segment_ids=jnp.asarray(seg))
        valid = seg[0] != 0
        np.testing.assert_allclose(
            np.asarray(got)[0, valid], np.asarray(ref)[0, valid], rtol=2e-4, atol=2e-5
        )

    def test_full_decoder_forward(self):
        """End-to-end llama forward through the ring at seq > per-device shard."""
        from dreamllm_tpu.models.llama import (
            LlamaConfig, init_llama_params, llama_forward,
        )
        from dreamllm_tpu.parallel.ring import ring_llama_forward

        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        cfg = LlamaConfig(
            vocab_size=256, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512,
        )
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(7)
        ids = jnp.asarray(rng.integers(0, 256, size=(2, 256)), jnp.int32)

        ref = llama_forward(params, cfg, input_ids=ids, use_flash=False)
        got = ring_llama_forward(params, cfg, mesh, input_ids=ids)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref["last_hidden_state"]),
            rtol=2e-4, atol=2e-4,
        )

    def test_full_decoder_packed_segments(self):
        from dreamllm_tpu.models.llama import (
            LlamaConfig, init_llama_params, llama_forward,
        )
        from dreamllm_tpu.parallel.ring import ring_llama_forward

        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        cfg = LlamaConfig(
            vocab_size=256, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512,
        )
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(8)
        ids = jnp.asarray(rng.integers(0, 256, size=(1, 128)), jnp.int32)
        seg = np.zeros((1, 128), np.int32)
        seg[0, :70] = 1
        seg[0, 70:110] = 2  # trailing 18 = padding
        seg = jnp.asarray(seg)

        ref = llama_forward(params, cfg, input_ids=ids, segment_ids=seg, use_flash=False)
        got = ring_llama_forward(params, cfg, mesh, input_ids=ids, segment_ids=seg)
        valid = np.asarray(seg)[0] != 0
        np.testing.assert_allclose(
            np.asarray(got)[0, valid],
            np.asarray(ref["last_hidden_state"])[0, valid],
            rtol=2e-4, atol=2e-4,
        )

    def test_train_step_sequence_parallel(self):
        """make_train_step with cfg.sequence_parallel_axis: one step runs and
        the loss matches the non-ring step on the same batch."""
        import optax

        from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params
        from dreamllm_tpu.models.llama import LlamaConfig
        from dreamllm_tpu.models.clip import CLIPVisionConfig
        from dreamllm_tpu.models.projector import ProjectorConfig
        from dreamllm_tpu.train.step import init_train_state, make_train_step

        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        llm = LlamaConfig(
            vocab_size=40000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512,
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
        cfg_ring = DreamLLMConfig(**common, sequence_parallel_axis="fsdp")
        cfg_ref = DreamLLMConfig(**common)
        params = init_dreamllm_params(jax.random.PRNGKey(0), cfg_ref)

        rng = np.random.default_rng(9)
        s = 256  # > max_position_embeddings of the reference design (2048-capped)
        ids = rng.integers(10, 1000, size=(2, s))
        labels = ids.copy()
        batch = {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
        }
        tx = optax.sgd(1e-3)

        step_ring = make_train_step(
            cfg_ring, tx, head_in_params=False, use_flash=False,
            donate=False, mesh=mesh,
        )
        step_ref = make_train_step(
            cfg_ref, tx, head_in_params=False, use_flash=False, donate=False,
        )
        st0 = init_train_state(params, tx)
        _, aux_ring = step_ring(st0, batch, jax.random.PRNGKey(1))
        st1 = init_train_state(params, tx)
        _, aux_ref = step_ref(st1, batch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            float(aux_ring["loss"]), float(aux_ref["loss"]), rtol=5e-4
        )
        np.testing.assert_allclose(
            float(aux_ring["grad_norm"]), float(aux_ref["grad_norm"]), rtol=5e-3
        )
        # sequence parallelism composes with autodiff pruning (the
        # stage2_longcontext config enables both): a frozen-CLIP mask
        # through the shard_map ring must update trainables identically
        from dreamllm_tpu.models.dreamllm import param_freeze_mask

        cfg_masked = DreamLLMConfig(
            **common, sequence_parallel_axis="fsdp",
            frozen=("clip_vision_embedding",),
        )
        mask = param_freeze_mask(params, cfg_masked)
        step_masked = make_train_step(
            cfg_masked, tx, head_in_params=False, use_flash=False,
            donate=False, mesh=mesh, trainable_mask=mask,
        )
        st2 = init_train_state(params, tx)
        st2, aux_m = step_masked(st2, batch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            float(aux_m["loss"]), float(aux_ref["loss"]), rtol=5e-4
        )
        # frozen subtree untouched, trainable llm updated
        for b, a in zip(jax.tree.leaves(params["clip_vision_embedding"]),
                        jax.tree.leaves(st2.params["clip_vision_embedding"])):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        assert not np.allclose(
            np.asarray(st2.params["llm"]["embed_tokens"]),
            np.asarray(params["llm"]["embed_tokens"]),
        )

    def test_grads_flow(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        q, k, v = make_qkv(seed=3)

        def loss_ring(q, k, v):
            return jnp.sum(ring_self_attention(q, k, v, mesh, axis="fsdp") ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, causal=True) ** 2)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)
