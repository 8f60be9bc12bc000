"""LoRA adapter + serving shim tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-suite only; fast tier: -m 'not slow'

from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward, llama_logits
from dreamllm_tpu.serve import ModelServer, OnlineClient
from dreamllm_tpu.train.lora import LoRAConfig, apply_lora, init_lora_params, lora_loss_fn

TINY = dict(vocab_size=120, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64)


class TestLoRA:
    def test_zero_init_is_identity(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        lcfg = LoRAConfig(rank=4)
        lora = init_lora_params(jax.random.PRNGKey(1), params, lcfg)
        merged = apply_lora(params, lora, lcfg)
        ids = jnp.asarray([[3, 7, 11]])
        a = llama_forward(params, cfg, input_ids=ids, use_flash=False)["last_hidden_state"]
        b = llama_forward(merged, cfg, input_ids=ids, use_flash=False)["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_grads_only_through_lora(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        lcfg = LoRAConfig(rank=4, targets=("wq", "wv"))
        lora = init_lora_params(jax.random.PRNGKey(1), params, lcfg)
        ids = jnp.asarray([[3, 7, 11, 2]])
        labels = ids

        def base_loss(p, batch, rng):
            h = llama_forward(p, cfg, input_ids=batch, use_flash=False)["last_hidden_state"]
            logits = llama_logits(p, cfg, h)
            logp = jax.nn.log_softmax(logits[:, :-1])
            return -jnp.mean(jnp.take_along_axis(logp, batch[:, 1:, None], axis=-1))

        fn = lora_loss_fn(params, lcfg, base_loss)
        g = jax.grad(fn)(lora, ids, None)
        # b factors get gradient (a's grad flows through b which is 0 -> a grad 0 at init)
        gb = float(sum(jnp.abs(x).sum() for x in
                       [g["layers"]["wq"]["b"], g["layers"]["wv"]["b"]]))
        assert gb > 0

    def test_training_changes_output(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        lcfg = LoRAConfig(rank=2)
        lora = init_lora_params(jax.random.PRNGKey(1), params, lcfg)
        ids = jnp.asarray([[3, 7, 11, 2]])

        def base_loss(p, batch, rng):
            h = llama_forward(p, cfg, input_ids=batch, use_flash=False)["last_hidden_state"]
            logits = llama_logits(p, cfg, h)
            logp = jax.nn.log_softmax(logits[:, :-1])
            return -jnp.mean(jnp.take_along_axis(logp, batch[:, 1:, None], axis=-1))

        fn = lora_loss_fn(params, lcfg, base_loss)
        l0 = float(fn(lora, ids, None))
        for _ in range(5):
            g = jax.grad(fn)(lora, ids, None)
            lora = jax.tree.map(lambda p, gg: p - 0.5 * gg, lora, g)
        l1 = float(fn(lora, ids, None))
        assert l1 < l0


class TestServe:
    def test_generate_and_logprob_roundtrip(self):
        def gen(prompt, kw):
            return prompt.upper() + "!" * kw.get("max_new_tokens", 1)

        def lp(context, conts):
            return [-float(len(c)) for c in conts]

        server = ModelServer(gen, lp, port=0).start()
        try:
            client = OnlineClient(f"http://127.0.0.1:{server.port}")
            assert client.healthy()
            assert client.generate("hi", max_new_tokens=3) == "HI!!!"
            assert client.logprob("c", ["a", "bbb"]) == [-1.0, -3.0]
        finally:
            server.stop()

    def test_micro_batching_merges_concurrent_requests(self):
        import threading

        calls = []

        def batch_gen(prompts):
            calls.append(len(prompts))
            return [p.upper() for p in prompts]

        server = ModelServer(
            generate_batch_fn=batch_gen, max_batch=4, batch_window_ms=150, port=0
        ).start()
        try:
            client = OnlineClient(f"http://127.0.0.1:{server.port}")
            results = {}

            def call(i):
                results[i] = client.generate(f"req{i}")

            threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            assert results == {i: f"REQ{i}" for i in range(6)}
            # 6 requests within the window must dispatch in < 6 batches
            assert sum(calls) == 6 and len(calls) < 6
            assert max(calls) >= 2  # at least one real merge happened
        finally:
            server.stop()

    def test_batched_generate_fn_fixed_shapes(self):
        from dreamllm_tpu.data.tokenization import ToyTokenizer
        from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params
        from dreamllm_tpu.serve.batching import make_batched_generate_fn

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=64,
        )
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        tok = ToyTokenizer(vocab_size=256)
        fn = make_batched_generate_fn(
            params, cfg, tok, batch_size=3, max_prompt_len=16,
            max_new_tokens=4, eos_token_id=-1, bos_token_id=1,
        )
        out2 = fn(["hello world", "bye"])
        assert len(out2) == 2
        out3 = fn(["a", "b", "c"])  # full batch, same compiled shape
        assert len(out3) == 3

    def test_batcher_error_propagates_to_all_waiters(self):
        from dreamllm_tpu.serve.batching import DynamicBatcher

        def bad(items):
            raise ValueError("kaput")

        b = DynamicBatcher(bad, max_batch=4, window_ms=5).start()
        try:
            import pytest

            with pytest.raises(ValueError, match="kaput"):
                b.submit("x", timeout=10)
        finally:
            b.stop()

    def test_error_handling(self):
        def gen(prompt, kw):
            raise RuntimeError("boom")

        server = ModelServer(gen, port=0).start()
        try:
            import json
            import urllib.error
            import urllib.request

            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/generate",
                data=json.dumps({"prompt": "x"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req, timeout=10)
                raise AssertionError("expected HTTP 500")
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert "boom" in json.loads(e.read())["error"]
        finally:
            server.stop()

    def test_batched_fn_chunks_oversized_windows(self):
        from dreamllm_tpu.data.tokenization import ToyTokenizer
        from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params
        from dreamllm_tpu.serve.batching import make_batched_generate_fn

        cfg = LlamaConfig(vocab_size=256, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          max_position_embeddings=64)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        fn = make_batched_generate_fn(
            params, cfg, ToyTokenizer(vocab_size=256), batch_size=2,
            max_prompt_len=16, max_new_tokens=4, eos_token_id=-1,
        )
        # 5 prompts through a batch-2 compiled fn: chunked, no assert
        out = fn([f"p {i}" for i in range(5)])
        assert len(out) == 5


class TestQLoRA:
    def test_attach_matches_merge_on_raw_base(self):
        """Unmerged (attach_lora / LoRATensor dispatch) forward equals the
        merged apply_lora forward on a float base."""
        from dreamllm_tpu.train.lora import attach_lora

        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        lcfg = LoRAConfig(rank=4)
        lora = init_lora_params(jax.random.PRNGKey(1), params, lcfg)
        # non-zero b so the delta is real
        lora["layers"]["wq"]["b"] = (
            jax.random.normal(jax.random.PRNGKey(2),
                              lora["layers"]["wq"]["b"].shape) * 0.05
        )
        ids = jnp.asarray([[1, 9, 14, 25]], jnp.int32)
        merged = llama_forward(apply_lora(params, lora, lcfg), cfg,
                               input_ids=ids)["last_hidden_state"]
        attached = llama_forward(attach_lora(params, lora, lcfg), cfg,
                                 input_ids=ids)["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(merged), np.asarray(attached),
                                   rtol=2e-4, atol=2e-4)

    def test_qlora_trains_over_int8_base(self):
        """QLoRA: the frozen base stays int8 (QTensor), only LoRA factors
        get gradients, and a few steps reduce the loss through the full
        scan-over-layers decoder forward."""
        import optax

        from dreamllm_tpu.ops.quant import QTensor, quantize_llama_params
        from dreamllm_tpu.train.lora import qlora_loss_fn

        cfg = LlamaConfig(**TINY)
        base = quantize_llama_params(init_llama_params(jax.random.PRNGKey(0), cfg))
        assert isinstance(base["layers"]["wq"], QTensor)
        lcfg = LoRAConfig(rank=4)
        lora = init_lora_params(jax.random.PRNGKey(1), base, lcfg)
        assert lora["layers"]["wq"]["a"].dtype == jnp.float32  # not int8

        ids = jnp.asarray([[1, 9, 14, 25, 3, 7, 22, 18]], jnp.int32)

        def lm_loss(p, batch, rng):
            h = llama_forward(p, cfg, input_ids=batch[:, :-1])["last_hidden_state"]
            logits = llama_logits(p, cfg, h)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = batch[:, 1:]
            return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], axis=-1))

        fn = qlora_loss_fn(base, lcfg, lm_loss)
        tx = optax.adam(1e-2)
        opt = tx.init(lora)
        l0 = None
        for i in range(5):
            loss, g = jax.value_and_grad(fn)(lora, ids, None)
            if l0 is None:
                l0 = float(loss)
            up, opt = tx.update(g, opt, lora)
            lora = optax.apply_updates(lora, up)
        assert float(loss) < l0, (float(loss), l0)
        # the base was untouched (still the same int8 tensors)
        assert isinstance(base["layers"]["wq"], QTensor)

    def test_qlora_serving_decode(self):
        """Attached adapters over an int8 base decode through generate_text
        (LoRATensor rides the decode scan + KV cache path)."""
        from dreamllm_tpu.generation.sampler import SamplingConfig, generate_text
        from dreamllm_tpu.ops.quant import quantize_llama_params
        from dreamllm_tpu.train.lora import attach_lora

        cfg = LlamaConfig(**TINY)
        base = quantize_llama_params(init_llama_params(jax.random.PRNGKey(0), cfg))
        lcfg = LoRAConfig(rank=4)
        lora = init_lora_params(jax.random.PRNGKey(1), base, lcfg)
        served = attach_lora(base, lora, lcfg)
        out = generate_text(
            served, cfg, jnp.asarray([[1, 9, 14]], jnp.int32),
            jnp.asarray([3], jnp.int32),
            SamplingConfig(greedy=True, max_new_tokens=6, eos_token_id=-1),
        )
        toks = np.asarray(out["tokens"][0, :6])
        assert ((0 <= toks) & (toks < cfg.vocab_size)).all()
        # zero-init b => adapter is an exact no-op: matches the plain base
        ref = generate_text(
            base, cfg, jnp.asarray([[1, 9, 14]], jnp.int32),
            jnp.asarray([3], jnp.int32),
            SamplingConfig(greedy=True, max_new_tokens=6, eos_token_id=-1),
        )
        np.testing.assert_array_equal(
            np.asarray(out["tokens"][0, :6]), np.asarray(ref["tokens"][0, :6]))


class TestQLoRAInt4AndCheckpoint:
    def test_matmul4_grad_via_custom_vjp(self):
        """int4 QLoRA needs dx through the quantized base; pallas_call has
        no transpose rule, so matmul4 carries a custom VJP (dequant
        backward). Gradient must match the dequantized-weight reference."""
        from dreamllm_tpu.ops.quant4 import dequantize_int4, matmul4, quantize_int4

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
        t = quantize_int4(w)
        x = jnp.asarray(rng.standard_normal((3, 256)), jnp.float32)

        def f(x):
            return jnp.sum(matmul4(x, t) ** 2)

        dx = jax.grad(f)(x)
        wd = dequantize_int4(t, jnp.float32)
        ref = jax.grad(lambda x: jnp.sum((x @ wd) ** 2))(x)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_apply_lora_rejects_quantized_base_and_loss_fn_autoselects(self):
        import pytest as _pytest

        from dreamllm_tpu.ops.quant import quantize_llama_params

        cfg = LlamaConfig(**TINY)
        base = quantize_llama_params(init_llama_params(jax.random.PRNGKey(0), cfg))
        lcfg = LoRAConfig(rank=2)
        lora = init_lora_params(jax.random.PRNGKey(1), base, lcfg)
        with _pytest.raises(TypeError, match="attach_lora"):
            apply_lora(base, lora, lcfg)
        # the default merge=True path silently auto-selects attach
        ids = jnp.asarray([[1, 9, 14, 25]], jnp.int32)

        def lm_loss(p, batch, rng):
            h = llama_forward(p, cfg, input_ids=batch)["last_hidden_state"]
            return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-4

        loss = lora_loss_fn(base, lcfg, lm_loss)(lora, ids, None)
        assert np.isfinite(float(loss))

    def test_attached_tree_survives_orbax_roundtrip_and_shards(self, tmp_path):
        """CLAUDE.md invariant: quantized pytree tensors must survive orbax
        round-trips. An attach_lora'd int8 tree must restore to working
        LoRATensors (incl. the scale leaf) and accept mesh shardings."""
        import orbax.checkpoint as ocp

        from dreamllm_tpu.ops.quant import LoRATensor, quantize_llama_params
        from dreamllm_tpu.parallel.mesh import MeshConfig, create_mesh
        from dreamllm_tpu.parallel.sharding import param_shardings
        from dreamllm_tpu.train.checkpoints import _rebuild_quantized
        from dreamllm_tpu.train.lora import attach_lora

        cfg = LlamaConfig(**TINY)
        base = quantize_llama_params(init_llama_params(jax.random.PRNGKey(0), cfg))
        lcfg = LoRAConfig(rank=2)
        lora = init_lora_params(jax.random.PRNGKey(1), base, lcfg)
        served = attach_lora(base, lora, lcfg)

        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(str(tmp_path / "p"), served)
        restored = _rebuild_quantized(ckpt.restore(str(tmp_path / "p")))
        rt = restored["layers"]["wq"]
        assert isinstance(rt, LoRATensor)
        np.testing.assert_array_equal(np.asarray(rt.scale), lcfg.scale)
        ids = jnp.asarray([[1, 9, 14]], jnp.int32)
        a = llama_forward(served, cfg, input_ids=ids)["last_hidden_state"]
        b = llama_forward(restored, cfg, input_ids=ids)["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
        # sharding rules accept the attached tree (size/shape duck-typing)
        mesh = create_mesh(MeshConfig(data=2, fsdp=2, tp=2))
        shardings = param_shardings(served, mesh, min_shard_size=0)
        assert shardings is not None


class TestServeCLI:
    def test_build_server_smoke_end_to_end(self, tmp_path):
        """The serve entry (projects/dreamllm/serve.py) builds a full
        server from a config: engine-backed /generate (+SSE), /logprob for
        the online evaluators, multimodal /chat — zero-download."""
        from dreamllm_tpu.config import LazyArgumentParser, default_setup
        from dreamllm_tpu.serve import OnlineClient
        from projects.dreamllm.serve import build_server

        args, config = LazyArgumentParser().parse([
            "--config_file", "projects/dreamllm/configs/smoke.py",
            f"run_dir={tmp_path}", "+port=0", "+slots=2", "+prefill_len=16",
            "+max_len=64", "+chunk_steps=4", "+prefix_cache_entries=2",
        ])
        default_setup(args, config)
        server = build_server(config).start()
        try:
            client = OnlineClient(f"http://127.0.0.1:{server.port}")
            assert client.healthy()
            text = client.generate("hello world", max_new_tokens=6)
            assert isinstance(text, str)
            deltas = list(client.generate_stream("hello world", max_new_tokens=6))
            assert "".join(deltas).strip() == text
            lps = client.logprob("the answer is", [" yes", " no"])
            assert len(lps) == 2 and all(np.isfinite(lps))
            img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
            out = client.chat([{"role": "user", "content": "see <image>"}],
                              images=[img], max_new_tokens=4)
            assert isinstance(out["text"], str)
        finally:
            server.stop()

    def test_build_server_int8_quantized(self, tmp_path):
        from dreamllm_tpu.config import LazyArgumentParser, default_setup
        from dreamllm_tpu.serve import OnlineClient
        from projects.dreamllm.serve import build_server

        args, config = LazyArgumentParser().parse([
            "--config_file", "projects/dreamllm/configs/smoke.py",
            f"run_dir={tmp_path}", "+port=0", "+slots=2", "+prefill_len=16",
            "+max_len=64", "+chunk_steps=4", "+quantize=int8", "+chat=false",
        ])
        default_setup(args, config)
        server = build_server(config).start()
        try:
            client = OnlineClient(f"http://127.0.0.1:{server.port}")
            assert isinstance(client.generate("hi there", max_new_tokens=4), str)
        finally:
            server.stop()

    def test_build_server_chat_images(self, tmp_path):
        """+chat_images=1 loads the SD head and routes /chat through the
        interleaved driver (image output path wired end-to-end)."""
        from dreamllm_tpu.config import LazyArgumentParser, default_setup
        from dreamllm_tpu.serve import OnlineClient
        from projects.dreamllm.serve import build_server

        args, config = LazyArgumentParser().parse([
            "--config_file", "projects/dreamllm/configs/smoke.py",
            f"run_dir={tmp_path}", "+port=0", "+slots=2", "+prefill_len=16",
            "+max_len=64", "+chunk_steps=4", "+chat_images=1",
            "+image_steps=2", "+max_new_tokens_limit=8",
        ])
        default_setup(args, config)
        server = build_server(config).start()
        try:
            client = OnlineClient(f"http://127.0.0.1:{server.port}")
            out = client.chat([{"role": "user", "content": "draw a cat"}],
                              max_new_tokens=4)
            # a random tiny model rarely emits <dream_start>; the contract is
            # the wired path executes and returns the {"text","images"} shape
            assert isinstance(out["text"], str)
            assert isinstance(out["images"], list)
        finally:
            server.stop()
