"""Chat API + prefetch utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.data.dataset_types import Message
from dreamllm_tpu.data.prefetch import background_iterator, device_prefetch
from dreamllm_tpu.data.tokenization import ToyTokenizer
from dreamllm_tpu.generation import SamplingConfig
from dreamllm_tpu.generation.chat import chat, encode_chat_prompt
from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params
from dreamllm_tpu.models.llama import LlamaConfig
from dreamllm_tpu.models.projector import ProjectorConfig

CFG = DreamLLMConfig(
    llm=LlamaConfig(vocab_size=40000, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                    max_position_embeddings=512),
    vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                            num_attention_heads=2, image_size=8, patch_size=4),
    vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
    n_dream_queries=4, image_embed_len=4,
)


class DecToy(ToyTokenizer):
    def decode(self, ids):
        return " ".join(f"t{int(i)}" for i in ids if int(i) > 9)


class TestChat:
    def test_encode_prompt_with_images(self):
        ids, pix, pos = encode_chat_prompt(
            DecToy(), CFG,
            [Message("user", "look <image> tell me"), Message("assistant", "")][:1],
            images=[np.zeros((8, 8, 3), np.float32)],
        )
        assert pix.shape == (1, 1, 8, 8, 3)
        st = CFG.special_tokens
        p = int(pos[0, 0])
        assert int(ids[0, p - 1]) == st.im_start

    def test_placeholder_count_mismatch(self):
        with pytest.raises(ValueError):
            encode_chat_prompt(DecToy(), CFG, [Message("user", "no image here")],
                               images=[np.zeros((8, 8, 3))])

    def test_text_chat(self):
        params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
        out = chat(params, CFG, DecToy(),
                   [Message("user", "hello there")],
                   sampling=SamplingConfig(greedy=True, max_new_tokens=4, eos_token_id=-1))
        assert isinstance(out["text"], str) and out["images"] == []

    def test_image_chat(self):
        params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
        out = chat(params, CFG, DecToy(),
                   [Message("user", "describe <image>")],
                   images=[np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)],
                   sampling=SamplingConfig(greedy=True, max_new_tokens=4, eos_token_id=-1))
        assert isinstance(out["text"], str)

    def test_interleaved_gets_per_request_sampling(self, monkeypatch):
        """A server built with a fixed InterleavedConfig must still honor
        per-request sampling: chat() merges the request's SamplingConfig
        (and caps its token budget at the server-configured one)."""
        import dreamllm_tpu.generation.chat as chat_mod
        from dreamllm_tpu.generation.interleaved import InterleavedConfig

        captured = {}

        def fake_generate(params, cfg, head_params, head_cfg, ids, icfg, rng, **kw):
            captured["icfg"] = icfg
            return {"segments": [], "images": []}

        monkeypatch.setattr(chat_mod, "generate_interleaved", fake_generate)
        params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
        server_icfg = InterleavedConfig(max_new_tokens=64, num_inference_steps=3)
        req_sampling = SamplingConfig(greedy=False, temperature=0.7,
                                      max_new_tokens=500, eos_token_id=-1)
        chat(params, CFG, DecToy(), [Message("user", "draw a cat")],
             sampling=req_sampling, head_params={"x": 1}, head_cfg=object(),
             interleaved=server_icfg)
        got = captured["icfg"]
        assert got.sampling is req_sampling
        assert got.max_new_tokens == 64          # capped at the server budget
        assert got.num_inference_steps == 3      # server knobs preserved


class TestChatServer:
    def test_multimodal_chat_over_http(self):
        """/chat serves a multimodal turn end-to-end: base64 image in the
        JSON body, <image> placeholder in the message, text out — and the
        result matches the in-process chat() call exactly."""
        from dreamllm_tpu.generation.chat import make_chat_fn
        from dreamllm_tpu.serve import ModelServer, OnlineClient

        params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
        tok = DecToy()
        server = ModelServer(chat_fn=make_chat_fn(params, CFG, tok), port=0).start()
        try:
            client = OnlineClient(f"http://127.0.0.1:{server.port}")
            img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
            msgs = [{"role": "user", "content": "describe <image>"}]
            out = client.chat(msgs, images=[img], max_new_tokens=4)
            assert isinstance(out["text"], str) and out["images"] == []
            ref = chat(
                params, CFG, tok, [Message("user", "describe <image>")],
                images=[img],
                sampling=SamplingConfig(greedy=True, max_new_tokens=4,
                                        eos_token_id=CFG.special_tokens.eos),
            )
            assert out["text"] == ref["text"]
            # invalid sampling params → HTTP 400, not a poisoned row
            import urllib.error

            with pytest.raises(urllib.error.HTTPError) as ei:
                client.chat(msgs, images=[img], max_new_tokens=2, top_p=0.0)
            assert ei.value.code == 400
            # unbounded / nonsense token budgets are rejected before they
            # size a KV cache; unknown templates are a 400, not a 500
            for bad in ({"max_new_tokens": 10**8}, {"max_new_tokens": 0},
                        {"max_new_tokens": -3}, {"template": "nope"}):
                with pytest.raises(urllib.error.HTTPError) as ei:
                    client.chat(msgs, images=[img], **bad)
                assert ei.value.code == 400, bad
        finally:
            server.stop()

    def test_server_fault_is_500_client_error_is_400(self):
        """Only ClientError maps to 400; a plain ValueError from the model
        fn is a server fault → logged 500 (regression: blanket ValueError
        → 400 used to mask model-side bugs as client errors)."""
        import urllib.error
        import urllib.request
        import json as _json

        from dreamllm_tpu.serve import ModelServer
        from dreamllm_tpu.utils.errors import ClientError

        def gen(prompt, req):
            if prompt == "clienterr":
                raise ClientError("bad knob")
            raise ValueError("model-side shape bug")

        server = ModelServer(generate_fn=gen, port=0).start()
        try:
            def post(prompt):
                r = urllib.request.Request(
                    f"http://127.0.0.1:{server.port}/generate",
                    data=_json.dumps({"prompt": prompt}).encode(),
                    headers={"Content-Type": "application/json"})
                urllib.request.urlopen(r, timeout=30)

            with pytest.raises(urllib.error.HTTPError) as ei:
                post("clienterr")
            assert ei.value.code == 400
            with pytest.raises(urllib.error.HTTPError) as ei:
                post("anything")
            assert ei.value.code == 500
        finally:
            server.stop()


class TestPrefetch:
    def test_device_prefetch_order_and_completeness(self):
        items = [{"x": np.full((2,), i)} for i in range(7)]
        out = list(device_prefetch(iter(items), size=3))
        assert len(out) == 7
        for i, o in enumerate(out):
            assert isinstance(o["x"], jax.Array)
            np.testing.assert_array_equal(np.asarray(o["x"]), [i, i])

    def test_background_iterator(self):
        out = list(background_iterator(range(20), maxsize=4))
        assert out == list(range(20))

    def test_background_iterator_propagates_errors(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        it = background_iterator(gen(), maxsize=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            list(it)


class TestEngineChat:
    def test_engine_backed_multimodal_chat(self):
        """make_chat_fn(engine=...) serves image+text chat through the
        continuous-batching engine's embeds lanes: responses match the
        in-process chat() exactly, concurrent requests are accepted without
        the server lock, and image OUTPUT configs are rejected up front."""
        import concurrent.futures as cf

        from dreamllm_tpu.generation.chat import make_chat_fn
        from dreamllm_tpu.serve import ModelServer, OnlineClient
        from dreamllm_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

        params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
        tok = DecToy()
        eng = ContinuousBatchingEngine(
            params["llm"], CFG.llm,
            SamplingConfig(greedy=True, max_new_tokens=0,
                           eos_token_id=CFG.special_tokens.eos, pad_token_id=0),
            EngineConfig(slots=2, prefill_len=16, max_len=64, chunk_steps=4),
        )
        chat_fn = make_chat_fn(params, CFG, tok, engine=eng)
        assert chat_fn.concurrent
        server = ModelServer(chat_fn=chat_fn, engine=eng, tokenizer=tok,
                             port=0).start()
        try:
            client = OnlineClient(f"http://127.0.0.1:{server.port}")
            img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
            msgs = [{"role": "user", "content": "describe <image>"}]
            out = client.chat(msgs, images=[img], max_new_tokens=6)
            ref = chat(
                params, CFG, tok, [Message("user", "describe <image>")],
                images=[img],
                sampling=SamplingConfig(greedy=True, max_new_tokens=6,
                                        eos_token_id=CFG.special_tokens.eos),
            )
            assert out["text"] == ref["text"]
            # concurrent multimodal chats (engine batches them, no lock)
            with cf.ThreadPoolExecutor(2) as ex:
                outs = list(ex.map(
                    lambda _: client.chat(msgs, images=[img], max_new_tokens=6),
                    range(2),
                ))
            assert all(o["text"] == ref["text"] for o in outs)
        finally:
            server.stop()
        with pytest.raises(ValueError):
            make_chat_fn(params, CFG, tok, engine=eng, head_params={"x": 1})
