"""int8 weight-only quantization: numerics, pytree behavior, quantized decode
consistency with the fp model."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.generation import SamplingConfig, generate_text
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward, llama_logits
from dreamllm_tpu.ops.quant import QTensor, dequantize, matmul, quantize_int8, quantize_llama_params

TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64)


class TestQuantOps:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
        t = quantize_int8(w)
        assert t.q.dtype == jnp.int8
        assert t.scale.shape == (1, 32)
        back = dequantize(t, jnp.float32)
        rel = float(jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w)))
        assert rel < 0.01  # 1/127 per-channel

    def test_stacked_layers_get_per_layer_scales(self):
        rng = np.random.default_rng(1)
        w = np.stack([rng.standard_normal((8, 4)), 100 * rng.standard_normal((8, 4))])
        t = quantize_int8(jnp.asarray(w, jnp.float32))
        assert t.scale.shape == (2, 1, 4)
        # layer 1's scale ~100x layer 0's
        assert float(t.scale[1].mean() / t.scale[0].mean()) > 10

    def test_matmul_matches_dequant(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
        t = quantize_int8(w)
        a = matmul(x, t)
        b = x @ dequantize(t, jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_qtensor_is_pytree(self):
        t = quantize_int8(jnp.ones((4, 4)))
        leaves = jax.tree.leaves(t)
        assert len(leaves) == 2
        out = jax.jit(lambda q: matmul(jnp.ones((1, 4)), q))(t)
        assert out.shape == (1, 4)


class TestQuantizedDecoder:
    def test_forward_close_to_fp(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        qparams = quantize_llama_params(params)
        ids = jnp.asarray([[3, 9, 21, 40]])
        ref = llama_logits(params, cfg,
                           llama_forward(params, cfg, input_ids=ids, use_flash=False)["last_hidden_state"])
        got = llama_logits(qparams, cfg,
                           llama_forward(qparams, cfg, input_ids=ids, use_flash=False)["last_hidden_state"])
        # logits close in a relative sense; argmax ideally preserved
        cos = float(
            jnp.sum(ref * got) / (jnp.linalg.norm(ref) * jnp.linalg.norm(got))
        )
        assert cos > 0.999

    def test_quantized_decode_runs(self):
        cfg = LlamaConfig(**TINY)
        params = quantize_llama_params(init_llama_params(jax.random.PRNGKey(0), cfg))
        out = generate_text(params, cfg, jnp.asarray([[3, 9, 21]]), jnp.asarray([3]),
                            SamplingConfig(greedy=True, max_new_tokens=5, eos_token_id=-1),
                            cache_dtype=jnp.float32)
        toks = np.asarray(out["tokens"][0])
        assert toks.shape == (5,)
        assert np.all((toks >= 0) & (toks < TINY["vocab_size"]))

    def test_memory_halved(self):
        cfg = LlamaConfig(**TINY, )
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        q = quantize_llama_params(params)

        def nbytes(t):
            return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))

        # the quantized matmul weights use ~1/4 the bytes of fp32 (int8+scales)
        orig = nbytes(params["layers"])
        quant = nbytes(q["layers"])
        assert quant < orig * 0.3

class TestFusedProjections:
    def test_fused_matches_unfused(self):
        from dreamllm_tpu.models.llama import fuse_llama_params

        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        fused = fuse_llama_params(params)
        assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
        ids = jnp.asarray([[3, 9, 21, 40]])
        a = llama_forward(params, cfg, input_ids=ids, use_flash=False)["last_hidden_state"]
        b = llama_forward(fused, cfg, input_ids=ids, use_flash=False)["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_fused_plus_int8_decode(self):
        from dreamllm_tpu.models.llama import fuse_llama_params

        cfg = LlamaConfig(**TINY)
        params = quantize_llama_params(
            fuse_llama_params(init_llama_params(jax.random.PRNGKey(0), cfg))
        )
        assert isinstance(params["layers"]["wqkv"], QTensor)
        out = generate_text(params, cfg, jnp.asarray([[3, 9, 21]]), jnp.asarray([3]),
                            SamplingConfig(greedy=True, max_new_tokens=4, eos_token_id=-1),
                            cache_dtype=jnp.float32)
        assert out["tokens"].shape == (1, 4)


class TestQuantCheckpoint:
    def test_qtensor_orbax_roundtrip(self, tmp_path):
        """Quantized serving checkpoints must save/restore through orbax."""
        from dreamllm_tpu.train.checkpoints import load_params, save_checkpoint

        cfg = LlamaConfig(**TINY)
        params = {"llm": quantize_llama_params(init_llama_params(jax.random.PRNGKey(0), cfg))}
        path = save_checkpoint(str(tmp_path / "q"), 1, params)
        back = load_params(path, like=params)
        w0 = params["llm"]["layers"]["wq"]
        w1 = back["llm"]["layers"]["wq"]
        assert isinstance(w1, QTensor) and w1.q.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(w0.q), np.asarray(w1.q))
        np.testing.assert_allclose(np.asarray(w0.scale), np.asarray(w1.scale))


class TestInt8KVCache:
    """int8 KV cache (per-slot-per-head absmax scales): halves cache HBM
    footprint/traffic for long-context serving; greedy decode should match
    the bf16 cache closely on a tiny model."""

    def _model(self):
        from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig(vocab_size=173, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          max_position_embeddings=128)
        return cfg, init_llama_params(jax.random.PRNGKey(3), cfg)

    def test_greedy_decode_matches_bf16_cache(self):
        from dreamllm_tpu.generation import SamplingConfig, generate_text

        cfg, params = self._model()
        ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 10, 170)
        lens = jnp.array([12, 9], jnp.int32)
        scfg = SamplingConfig(greedy=True, max_new_tokens=16, eos_token_id=-1)
        ref = generate_text(params, cfg, ids, lens, scfg, cache_dtype=jnp.float32)
        out = generate_text(params, cfg, ids, lens, scfg, cache_dtype=jnp.int8)
        a, b = np.asarray(ref["tokens"]), np.asarray(out["tokens"])
        # int8 cache is lossy; on a tiny random model the greedy stream should
        # still agree for a long prefix
        agree = (a == b).mean()
        assert agree >= 0.75, (agree, a, b)

    def test_cache_layout_and_memory(self):
        from dreamllm_tpu.models.llama import init_kv_cache, llama_forward

        cfg, params = self._model()
        cache = init_kv_cache(cfg, 2, 32, dtype=jnp.int8)
        assert cache["k"].dtype == jnp.int8
        assert cache["k_scale"].shape == (2, 2, 32, 4)
        out = llama_forward(params, cfg,
                            input_ids=jax.random.randint(jax.random.PRNGKey(1), (2, 8), 10, 170),
                            kv_cache=cache)
        nc = out["kv_cache"]
        assert nc["k"].dtype == jnp.int8 and int(nc["index"]) == 8
        # written slots carry nonzero scales, untouched slots zero
        assert float(jnp.max(nc["k_scale"][:, :, :8])) > 0
        assert float(jnp.max(nc["k_scale"][:, :, 8:])) == 0.0

    def test_quantize_roundtrip_error(self):
        from dreamllm_tpu.models.llama import _kv_dequantize, _kv_quantize

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 16), jnp.float32)
        codes, scale = _kv_quantize(x)
        y = _kv_dequantize(codes, scale, jnp.float32)
        err = jnp.max(jnp.abs(x - y) / (jnp.max(jnp.abs(x)) + 1e-9))
        assert float(err) < 1.0 / 127

    def test_beam_search_int8_cache_gather(self):
        from dreamllm_tpu.generation.sampler import beam_search

        cfg, params = self._model()
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 10), 10, 170)
        lens = jnp.array([10, 7], jnp.int32)
        out = beam_search(params, cfg, ids, lens, num_beams=3,
                          max_new_tokens=6, eos_token_id=-1, cache_dtype=jnp.int8)
        ref = beam_search(params, cfg, ids, lens, num_beams=3,
                          max_new_tokens=6, eos_token_id=-1, cache_dtype=jnp.float32)
        a, b = np.asarray(out["tokens"]), np.asarray(ref["tokens"])
        assert a.shape == (2, 6)
        assert (a == b).mean() >= 0.5  # lossy cache, tiny random model
