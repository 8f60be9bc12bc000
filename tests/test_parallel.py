"""Multi-chip sharding tests on the virtual 8-device CPU mesh — the
distributed-path coverage the reference never had (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import (
    DreamLLMConfig,
    dreamllm_forward,
    init_dreamllm_params,
    param_freeze_mask,
)
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward
from dreamllm_tpu.models.projector import ProjectorConfig
from dreamllm_tpu.parallel import MeshConfig, batch_shardings, create_mesh, param_shardings
from dreamllm_tpu.train import (
    OptimizerConfig,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


LLM = LlamaConfig(
    vocab_size=40000, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    max_position_embeddings=128,
)


class TestMesh:
    def test_resolve_fills_missing_axis(self):
        assert MeshConfig(data=2, fsdp=-1, tp=2).resolve(8) == (2, 2, 2)
        assert MeshConfig().resolve(8) == (1, 8, 1)

    def test_resolve_rejects_uncoverable_device_counts(self):
        # regression: used to emit a 0-sized axis (mesh (2, 0, 2) for 1 device)
        with pytest.raises(ValueError):
            MeshConfig(data=2, fsdp=-1, tp=2).resolve(1)
        with pytest.raises(ValueError):
            MeshConfig(data=2, fsdp=-1, tp=2).resolve(6)
        with pytest.raises(ValueError):
            MeshConfig(data=3, fsdp=1, tp=1).resolve(8)

    def test_create_mesh_axes(self):
        mesh = create_mesh(MeshConfig(data=2, fsdp=2, tp=2))
        assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "tp": 2}


class TestShardings:
    def test_llm_rules(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=4, tp=2))
        params = init_llama_params(jax.random.PRNGKey(0), LLM)
        sh = param_shardings(params, mesh, min_shard_size=0)
        assert sh["layers"]["wq"].spec == P(None, "fsdp", "tp")
        assert sh["layers"]["wo"].spec == P(None, "tp", "fsdp")
        assert sh["embed_tokens"].spec == P("tp", "fsdp")
        assert sh["lm_head"].spec == P("fsdp", "tp")
        # norms replicated
        assert all(ax is None for ax in sh["final_norm"].spec)

    def test_indivisible_dims_fall_back_to_replication(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=4, tp=2))
        params = {"layers": {"wq": jnp.zeros((2, 66, 30))}}  # 66 % 4 != 0, 30 % 2 == 0
        sh = param_shardings(params, mesh, min_shard_size=0)
        assert sh["layers"]["wq"].spec == P(None, None, "tp")

    def test_sharded_forward_matches_single_device(self):
        mesh = create_mesh(MeshConfig(data=2, fsdp=2, tp=2))
        params = init_llama_params(jax.random.PRNGKey(0), LLM)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (4, 16)))

        ref = llama_forward(params, LLM, input_ids=ids, use_flash=False)["last_hidden_state"]

        sp = jax.tree.map(jax.device_put, params, param_shardings(params, mesh))
        sb = jax.tree.map(jax.device_put, {"x": ids}, batch_shardings({"x": ids}, mesh))["x"]

        @jax.jit
        def f(p, i):
            return llama_forward(p, LLM, input_ids=i, use_flash=False)["last_hidden_state"]

        out = f(sp, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


class TestOptim:
    def test_schedules_shapes(self):
        for s in ("constant", "linear", "cosine", "cosine_restarts", "polynomial"):
            cfg = OptimizerConfig(learning_rate=1e-3, schedule=s, warmup_steps=10, total_steps=100)
            f = make_lr_schedule(cfg)
            assert float(f(0)) == pytest.approx(0.0, abs=1e-8)  # warmup start
            assert float(f(10)) == pytest.approx(1e-3, rel=1e-5)  # peak
            assert float(f(100)) <= 1e-3 * (1 + 1e-5)

    def test_freeze_mask_zeroes_updates(self):
        params = {"a": jnp.ones((4, 4)), "b": jnp.ones((4, 4))}
        mask = {"a": jax.tree.map(lambda _: True, params["a"]), "b": False}
        mask = {"a": True, "b": False}
        tx = make_optimizer(OptimizerConfig(learning_rate=0.1, warmup_steps=0,
                                            total_steps=10, schedule="constant"),
                            trainable_mask=mask)
        state = tx.init(params)
        grads = {"a": jnp.ones((4, 4)), "b": jnp.ones((4, 4))}
        updates, _ = tx.update(grads, state, params)
        assert float(jnp.abs(updates["a"]).sum()) > 0
        assert float(jnp.abs(updates["b"]).sum()) == 0.0


class TestTrainStep:
    def _setup(self):
        cfg = DreamLLMConfig(
            llm=LLM,
            vision=CLIPVisionConfig(
                hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                num_attention_heads=2, image_size=8, patch_size=4,
            ),
            vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=64),
            n_dream_queries=4, image_embed_len=4,
        )
        params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
        ids = np.random.default_rng(0).integers(10, 1000, (4, 16))
        labels = ids.copy()
        batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)}
        return cfg, params, batch

    def test_loss_decreases_over_steps(self):
        cfg, params, batch = self._setup()
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-2, schedule="constant",
                                            warmup_steps=0, total_steps=100))
        state = init_train_state(params, tx)
        step = make_train_step(cfg, tx, head_in_params=False, use_flash=False, donate=False)
        losses = []
        for i in range(5):
            state, aux = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(aux["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_grad_accum_matches_full_batch(self):
        cfg, params, batch = self._setup()
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, schedule="constant",
                                            warmup_steps=0, total_steps=100, max_grad_norm=0.0))
        s1 = init_train_state(params, tx)
        s2 = init_train_state(params, tx)
        full = make_train_step(cfg, tx, head_in_params=False, use_flash=False,
                               grad_accum=1, donate=False)
        accum = make_train_step(cfg, tx, head_in_params=False, use_flash=False,
                                grad_accum=2, donate=False)
        s1, a1 = full(s1, batch, jax.random.PRNGKey(0))
        s2, a2 = accum(s2, batch, jax.random.PRNGKey(0))
        # same data, loss averaged over micro-batches == full-batch loss
        ref = jax.tree.leaves(s1.params)
        got = jax.tree.leaves(s2.params)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=5e-3, atol=5e-5)

    def test_frozen_subtree_not_updated(self):
        cfg, params, batch = self._setup()
        cfg = DreamLLMConfig(
            llm=cfg.llm, vision=cfg.vision, vision_projector=cfg.vision_projector,
            n_dream_queries=4, image_embed_len=4,
            frozen=("clip_vision_embedding",),
        )
        mask = param_freeze_mask(params, cfg)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-2, schedule="constant",
                                            warmup_steps=0, total_steps=100),
                            trainable_mask=mask)
        state = init_train_state(params, tx)
        step = make_train_step(cfg, tx, head_in_params=False, use_flash=False, donate=False)
        before = jax.tree.map(lambda x: np.asarray(x).copy(), params["clip_vision_embedding"])
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        after = state.params["clip_vision_embedding"]
        for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


class TestAutodiffPruning:
    """make_train_step(trainable_mask=...) prunes frozen subtrees from the
    backward graph; the TRAINABLE updates must be identical to the unpruned
    step (frozen grads were zeroed by the optimizer mask anyway)."""

    def test_pruned_step_matches_unpruned_trainables(self):
        from dreamllm_tpu.models.clip import CLIPVisionConfig
        from dreamllm_tpu.models.dreamllm import (
            DreamLLMConfig, init_dreamllm_params, param_freeze_mask,
        )
        from dreamllm_tpu.models.llama import LlamaConfig
        from dreamllm_tpu.models.projector import ProjectorConfig

        cfg = DreamLLMConfig(
            llm=LlamaConfig(vocab_size=1000, hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, max_position_embeddings=64),
            vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                    num_hidden_layers=2, num_attention_heads=2,
                                    image_size=8, patch_size=4),
            vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=64),
            n_dream_queries=4, image_embed_len=4,
            frozen=("clip_vision_embedding",),
        )
        params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        ids = rng.integers(10, 900, (2, 16)).astype(np.int32)
        st = cfg.special_tokens
        ids[:, 1] = st.im_start
        ids[:, 2:6] = st.im_patch
        ids[:, 6] = st.im_end
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(ids),
            "images": jnp.asarray(rng.standard_normal((2, 1, 8, 8, 3)), jnp.float32),
            "image_positions": jnp.full((2, 1), 2, jnp.int32),
        }
        mask = param_freeze_mask(params, cfg)
        ocfg = OptimizerConfig(learning_rate=1e-2, schedule="constant",
                               warmup_steps=0, total_steps=100)
        tx = make_optimizer(ocfg, trainable_mask=mask)

        s_ref = init_train_state(params, tx)
        s_pruned = init_train_state(params, tx)
        ref_step = make_train_step(cfg, tx, head_in_params=False,
                                   use_flash=False, donate=False)
        pruned_step = make_train_step(cfg, tx, head_in_params=False,
                                      use_flash=False, donate=False,
                                      trainable_mask=mask)
        s_ref, a_ref = ref_step(s_ref, batch, jax.random.PRNGKey(0))
        s_pruned, a_pruned = pruned_step(s_pruned, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(a_pruned["loss"]), float(a_ref["loss"]),
                                   rtol=1e-6)
        # all params identical after the step: trainables got the same
        # update (same grads), frozen were untouched on both sides
        for r, p in zip(jax.tree.leaves(s_ref.params),
                        jax.tree.leaves(s_pruned.params)):
            np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                       rtol=1e-5, atol=1e-7)

    def test_pruned_step_with_quantized_frozen_base(self):
        """The mask is a PREFIX tree: one bool covers a whole QTensor node
        (reviewer-reproduced crash with params-first tree.map). A QLoRA-ish
        step — quantized frozen decoder layers, trainable embeddings — must
        run, keep the QTensor bytes untouched, and update the trainables."""
        from dreamllm_tpu.models.dreamllm import (
            DreamLLMConfig, init_dreamllm_params, param_freeze_mask,
        )
        from dreamllm_tpu.models.clip import CLIPVisionConfig
        from dreamllm_tpu.models.llama import LlamaConfig
        from dreamllm_tpu.models.projector import ProjectorConfig
        from dreamllm_tpu.ops.quant import QTensor, quantize_llama_params

        cfg = DreamLLMConfig(
            llm=LlamaConfig(vocab_size=1000, hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, max_position_embeddings=64),
            vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                    num_hidden_layers=2, num_attention_heads=2,
                                    image_size=8, patch_size=4),
            vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
            n_dream_queries=4, image_embed_len=4,
            frozen=("llm/layers", "llm/lm_head", "clip_vision_embedding"),
        )
        params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
        params["llm"] = quantize_llama_params(params["llm"])
        assert isinstance(params["llm"]["layers"]["wq"], QTensor)
        mask = param_freeze_mask(params, cfg)
        assert mask["llm"]["layers"]["wq"] is False  # prefix bool per node

        ids = np.random.default_rng(0).integers(10, 900, (2, 16)).astype(np.int32)
        batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids)}
        tx = make_optimizer(
            OptimizerConfig(learning_rate=1e-2, schedule="constant",
                            warmup_steps=0, total_steps=10),
            trainable_mask=mask,
        )
        state = init_train_state(params, tx)
        step = make_train_step(cfg, tx, head_in_params=False, use_flash=False,
                               donate=False, trainable_mask=mask)
        state, aux = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(aux["loss"]))
        np.testing.assert_array_equal(
            np.asarray(state.params["llm"]["layers"]["wq"].q),
            np.asarray(params["llm"]["layers"]["wq"].q))
        assert not np.allclose(np.asarray(state.params["llm"]["embed_tokens"]),
                               np.asarray(params["llm"]["embed_tokens"]))


class TestScanUnrollThreading:
    def test_unrolled_step_matches_scanned(self):
        """scan_unroll=True through make_train_step produces the same loss
        and parameters as the default scanned stack."""
        cfg = DreamLLMConfig(
            llm=LLM,
            vision=CLIPVisionConfig(
                hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                num_attention_heads=2, image_size=8, patch_size=4,
            ),
            vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=64),
            n_dream_queries=4, image_embed_len=4,
        )
        params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
        ids = np.random.default_rng(0).integers(10, 1000, (2, 16))
        batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids)}
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, schedule="constant",
                                            warmup_steps=0, total_steps=10))
        outs = []
        for unroll in (1, True):
            state = init_train_state(params, tx)
            step = make_train_step(cfg, tx, head_in_params=False, use_flash=False,
                                   donate=False, remat="dots", scan_unroll=unroll)
            state, aux = step(state, batch, jax.random.PRNGKey(0))
            outs.append((float(aux["loss"]), jax.tree.leaves(state.params)))
        assert np.isclose(outs[0][0], outs[1][0], rtol=1e-6)
        # Adam's sqrt(v) normalization amplifies unroll-vs-scan float
        # reassociation noise in the grads to O(1e-4) relative in the
        # post-update params; wrong threading would diverge wholesale.
        for a, b in zip(outs[0][1], outs[1][1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
