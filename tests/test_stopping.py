"""Stop-string stopping + truncation (generation/stopping.py + engine/sampler
wiring) — reference semantics: KeywordsStoppingCriteria halts generate() on
the conversation separator and the separator is stripped from the output
(omni/utils/conversation.py:16-31, omni/eval/vqa/vqa_inference.py:96-146)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.data.conversation import TEMPLATES
from dreamllm_tpu.generation.sampler import SamplingConfig, beam_search, generate_text
from dreamllm_tpu.generation.stopping import (
    make_stop_fn,
    single_token_stop_ids,
    stop_str_for,
    truncate_at_stop,
)
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params
from dreamllm_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig


class FakeTok:
    """id <-> single char; 35 = '#', so ids [35,35,35] decode to '###'."""

    def decode(self, ids):
        return "".join(chr(i) for i in ids)

    def encode(self, s):
        return [ord(c) for c in s]


class TestHelpers:
    def test_truncate_at_first_occurrence(self):
        assert truncate_at_stop("a turn ### next turn ###", ["###"]) == "a turn"
        assert truncate_at_stop("no separator here", ["###"]) == "no separator here"
        assert truncate_at_stop("tail ###", ["###", "@@"]) == "tail"
        assert truncate_at_stop("x @@ y ###", ["###", "@@"]) == "x"

    def test_stop_str_for_templates(self):
        assert stop_str_for(TEMPLATES["vicuna_v0"]) == "###"
        assert stop_str_for(TEMPLATES["vicuna_v1.1"]) == "</s>"
        assert stop_str_for(TEMPLATES["llama2"]) == "</s>"

    def test_single_token_stop_ids(self):
        tok = FakeTok()
        assert single_token_stop_ids(tok, ["#"]) == (35,)
        assert single_token_stop_ids(tok, ["###"]) == ()  # multi-token
        assert single_token_stop_ids(tok, ["#", "###"]) == (35,)

    def test_make_stop_fn(self):
        tok = FakeTok()
        fn = make_stop_fn(tok, ["###"])
        assert fn is not None
        assert not fn([ord("a"), ord("#")])
        assert fn([ord("a"), 35, 35, 35, ord("b")])
        # a fully single-token stop set is covered device-side -> None
        assert make_stop_fn(tok, ["#"], exclude_ids=(35,)) is None

    def test_make_stop_fn_tail_window_is_incremental(self):
        """The predicate decodes only the new tail (plus overlap), not the
        whole history — O(n) total host work instead of O(n^2) on the
        single-core scheduler thread."""
        tok = FakeTok()
        calls = []
        orig = tok.decode
        tok.decode = lambda ids: (calls.append(len(ids)), orig(ids))[1]
        fn = make_stop_fn(tok, ["###"])
        ids: list[int] = []
        for _ in range(50):
            ids.extend([ord("a")] * 8)  # one 8-token chunk
            assert not fn(list(ids))
        # each check decodes ~(chunk + overlap), never the full 400-token list
        assert max(calls) <= 8 + len("###") + 8
        # a stop spanning the chunk boundary is still caught
        ids.extend([35, 35])
        assert not fn(list(ids))
        ids.extend([35, ord("b")])
        assert fn(list(ids))

    def test_make_stop_fn_resets_on_shrinking_list(self):
        tok = FakeTok()
        fn = make_stop_fn(tok, ["###"])
        assert not fn([ord("a")] * 20)
        # a shorter list (fn reused by mistake) still sees its whole content
        assert fn([35, 35, 35])

    def test_stops_for_template_drops_eos_separator(self):
        from dreamllm_tpu.generation.stopping import stops_for_template

        tok = FakeTok()
        # llama2-style: separator "</s>" — dropped via the literal fallback
        # (FakeTok has no special-token awareness)
        strings, halt = stops_for_template(TEMPLATES["llama2"], tok, eos_id=2)
        assert strings == [] and halt == ()
        # vicuna_v0: "###" is a real stop (multi-token for this tok)
        strings, halt = stops_for_template(TEMPLATES["vicuna_v0"], tok, eos_id=2)
        assert strings == ["###"] and halt == ()

        class EosAwareTok(FakeTok):
            # ChatML-style: the separator string IS the eos token
            def encode(self, s):
                return [7] if s == "<|im_end|>" else super().encode(s)

        strings, halt = stops_for_template(
            TEMPLATES["mpt"], EosAwareTok(), eos_id=7)
        assert strings == [] and halt == ()
        # same template, model whose EOS differs: stays a device-side halt
        strings, halt = stops_for_template(
            TEMPLATES["mpt"], EosAwareTok(), eos_id=2)
        assert strings == ["<|im_end|>"] and halt == (7,)

    def test_vicuna_v0_renders_single_style(self):
        from dreamllm_tpu.data.conversation import render_prompt
        from dreamllm_tpu.data.dataset_types import Message

        p = render_prompt(TEMPLATES["vicuna_v0"], [Message("user", "hi")])
        # reference SeparatorStyle.SINGLE: system###Human: hi###Assistant:
        assert p.endswith("###Human: hi###Assistant:")
        assert "###" in p


@pytest.fixture(scope="module")
def small():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, dtype=jnp.float32,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _ref(cfg, params, ids, max_new, **kw):
    out = generate_text(
        params, cfg, jnp.asarray([ids], jnp.int32),
        jnp.asarray([len(ids)], jnp.int32),
        SamplingConfig(greedy=True, max_new_tokens=max_new, **kw),
    )
    return list(np.asarray(out["tokens"][0])[: int(out["lengths"][0])])


class TestSamplerHalt:
    def test_halt_token_not_stored(self, small):
        cfg, params = small
        prompt = [1, 17, 23, 42]
        ref = _ref(cfg, params, prompt, 12)
        assert len(ref) >= 4
        sep = ref[3]  # pretend the 4th generated token is the separator
        got = _ref(cfg, params, prompt, 12, halt_tokens=(int(sep),))
        first = ref.index(sep)
        assert got == ref[:first]  # truncated BEFORE the separator

    def test_speculative_halt_parity(self, small):
        from dreamllm_tpu.generation.sampler import generate_text_speculative

        cfg, params = small
        prompt = [1, 17, 23, 42]
        ref = _ref(cfg, params, prompt, 12)
        sep = ref[3]
        scfg = SamplingConfig(greedy=True, max_new_tokens=12,
                              halt_tokens=(int(sep),))
        out = generate_text_speculative(
            params, cfg, jnp.asarray([prompt], jnp.int32),
            jnp.asarray([len(prompt)], jnp.int32), scfg, draft_len=4,
        )
        got = list(np.asarray(out["tokens"][0])[: int(out["lengths"][0])])
        assert got == ref[: ref.index(sep)]

    def test_beam_halt_strips(self, small):
        cfg, params = small
        prompt = [1, 17, 23, 42]
        base = beam_search(
            params, cfg, jnp.asarray([prompt], jnp.int32),
            jnp.asarray([len(prompt)], jnp.int32),
            num_beams=2, max_new_tokens=8,
        )
        toks = list(np.asarray(base["tokens"][0]))
        nonpad = [t for t in toks if t != 0]
        assert nonpad, "beam produced nothing"
        sep = int(nonpad[min(2, len(nonpad) - 1)])
        out = beam_search(
            params, cfg, jnp.asarray([prompt], jnp.int32),
            jnp.asarray([len(prompt)], jnp.int32),
            num_beams=2, max_new_tokens=8, halt_tokens=(sep,),
        )
        got = list(np.asarray(out["tokens"][0]))
        assert sep not in got  # halts at and strips the separator


class TestEngineStops:
    def _engine(self, cfg, params, **kw):
        scfg = SamplingConfig(greedy=True, max_new_tokens=0, eos_token_id=2,
                              pad_token_id=0)
        ecfg = EngineConfig(slots=2, prefill_len=16, max_len=64,
                            chunk_steps=4, **kw)
        return ContinuousBatchingEngine(params, cfg, scfg, ecfg)

    def test_device_side_stop_token(self, small):
        cfg, params = small
        prompt = [1, 17, 23, 42]
        ref = _ref(cfg, params, prompt, 12)
        sep = int(ref[3])
        eng = self._engine(cfg, params).start()
        try:
            got = eng.submit(prompt, max_new_tokens=12, stop_token_ids=(sep,))
            assert got == ref[: ref.index(sep)]
            # a lane without stops is unaffected (per-slot sets)
            got2 = eng.submit(prompt, max_new_tokens=12)
            assert got2 == ref
        finally:
            eng.stop()

    def test_too_many_stop_ids_rejected(self, small):
        cfg, params = small
        eng = self._engine(cfg, params, max_stop_tokens=2).start()
        try:
            with pytest.raises(Exception):
                eng.submit([1, 2, 3], max_new_tokens=4,
                           stop_token_ids=(5, 6, 7))
        finally:
            eng.stop()

    def test_host_side_stop_fn_retires_lane(self, small):
        cfg, params = small
        prompt = [1, 17, 23, 42]
        ref = _ref(cfg, params, prompt, 40)
        sep = int(ref[5])

        def stop_fn(ids):
            return sep in ids

        eng = self._engine(cfg, params).start()
        try:
            got = eng.submit(prompt, max_new_tokens=40, stop_fn=stop_fn)
            # the lane retires within ~2 chunks of the separator appearing
            # (pipelined results lag one chunk); tokens stay a ref prefix
            assert got == ref[: len(got)]
            assert sep in got
            first = ref.index(sep)
            assert len(got) <= first + 2 * 4 + 1  # 2 chunks of overshoot max
            assert len(got) < len(ref)
        finally:
            eng.stop()

    def test_host_stop_truncation_matches_reference_semantics(self, small):
        """End-to-end: engine ids -> decoded text -> truncate_at_stop gives
        the clean turn even when decode overshoots the separator."""
        cfg, params = small
        prompt = [1, 17, 23, 42]
        ref = _ref(cfg, params, prompt, 40)
        sep = int(ref[5])
        tok = FakeTok()
        stop_str = chr(sep)
        fn = make_stop_fn(tok, [stop_str])
        eng = self._engine(cfg, params).start()
        try:
            got = eng.submit(prompt, max_new_tokens=40, stop_fn=fn)
            text = truncate_at_stop(tok.decode(got), [stop_str])
            assert text == tok.decode(ref[: ref.index(sep)]).strip()
        finally:
            eng.stop()


# ---------------------------------------------------------------------------
# r4 template-registry additions: MPT/ChatML style, seeded demo turns
# ---------------------------------------------------------------------------


def test_mpt_template_renders_chatml_and_stops_on_im_end():
    from dreamllm_tpu.data.conversation import TEMPLATES, render_conversation, render_prompt
    from dreamllm_tpu.data.dataset_types import Message
    from dreamllm_tpu.generation.stopping import stop_str_for

    t = TEMPLATES["mpt"]
    msgs = [Message("user", "hello"), Message("assistant", "hi")]
    # reference SeparatorStyle.MPT (conversation.py:71-80):
    # system + sep, then role + message + sep (role tags carry the header)
    text = "".join(s.text for s in render_conversation(t, msgs))
    assert text == (t.system + "<|im_end|>"
                    + "<|im_start|>user\nhello<|im_end|>"
                    + "<|im_start|>assistant\nhi<|im_end|>")
    # only the assistant reply (+ its sep) is learnable
    learn = [s.text for s in render_conversation(t, msgs) if s.learnable]
    assert learn == ["hi<|im_end|>"]
    # generation prompt ends with the bare assistant header (:77-79)
    assert render_prompt(t, [Message("user", "q")]).endswith("<|im_start|>assistant\n")
    assert stop_str_for(t) == "<|im_end|>"


def test_seed_messages_render_first_and_are_never_learnable():
    from dreamllm_tpu.data.conversation import TEMPLATES, render_conversation
    from dreamllm_tpu.data.dataset_types import Message

    t = TEMPLATES["multimodal"]  # seeds the Hi!/Hi there! exchange (offset=2)
    segs = render_conversation(t, [Message("user", "real question"),
                                   Message("assistant", "real answer")])
    text = "".join(s.text for s in segs)
    assert "Hi there!" in text and text.index("Hi there!") < text.index("real question")
    learn = [s.text for s in segs if s.learnable]
    assert learn == ["real answer###"]  # the SEEDED reply is masked

    # dream_conv: the one-shot interleaved example precedes the dialog and
    # carries <dream_start> spans, but only the real reply is learnable
    d = TEMPLATES["dream_conv"]
    segs = render_conversation(d, [Message("user", "write about cats"),
                                   Message("assistant", "cats! <dream_start> <dream_end>")])
    text = "".join(s.text for s in segs)
    assert text.index("<dream_start>") < text.index("write about cats")
    learn = [s.text for s in segs if s.learnable]
    assert learn == ["cats! <dream_start> <dream_end></s>"]


def test_llava_v1_matches_vicuna_mechanics():
    from dreamllm_tpu.data.conversation import TEMPLATES, render_prompt
    from dreamllm_tpu.data.dataset_types import Message

    t = TEMPLATES["llava_v1"]
    p = render_prompt(t, [Message("user", "what is this?")])
    assert p.startswith("You are LLaVA")
    assert p.endswith("ASSISTANT:")
