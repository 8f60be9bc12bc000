"""Offset-based conversation building with a REAL fast tokenizer (gpt2 is
bundled with transformers tests? No — build a tiny fast tokenizer from
tokenizers directly), verifying label masking is exact at turn boundaries."""

import numpy as np
import pytest

from dreamllm_tpu.data import BuilderConfig, ConversationSample, DreamLLMBuilder, Message
from dreamllm_tpu.data.builder import IGNORE

CFG = BuilderConfig(max_seq_len=256, image_embed_len=4, n_dream_queries=4,
                    max_images=2, image_size=8, image_size_dm=16)


class OffsetToy:
    """Whitespace word tokenizer with char offsets (stands in for an HF fast
    tokenizer; same contract as HFTokenizer.encode_with_offsets)."""

    def encode(self, text):
        return [10 + (hash(w) % 1000) for w in text.split()]

    def encode_with_offsets(self, text):
        ids, offs = [], []
        i = 0
        for w in text.split():
            start = text.index(w, i)
            ids.append(10 + (hash(w) % 1000))
            offs.append((start, start + len(w)))
            i = start + len(w)
        return ids, offs

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_offsets_only_assistant_learnable():
    b = DreamLLMBuilder(OffsetToy(), CFG)
    s = b.build(ConversationSample(messages=[
        Message("user", "what is this thing"),
        Message("assistant", "it is a cat"),
        Message("user", "sure?"),
        Message("assistant", "definitely yes"),
    ]))
    learn = s.labels != IGNORE
    # learnable tokens: the two assistant replies (+eos); user/system masked
    n_learn = int(learn.sum())
    assert 6 <= n_learn <= 9  # "it is a cat</s>" (~5) + "definitely yes</s>" (~3) + eos
    # system prompt masked
    assert np.all(s.labels[:10] == IGNORE)


def test_offsets_with_image():
    b = DreamLLMBuilder(OffsetToy(), CFG)
    s = b.build(ConversationSample(messages=[
        Message("user", "look <image> here"),
        Message("assistant", "ok"),
    ], images=[np.zeros((8, 8, 3), np.float32)]))
    assert len(s.image_positions) == 1
    st = CFG.special
    p = s.image_positions[0]
    assert s.input_ids[p - 1] == st.im_start
    assert np.all(s.labels[p - 1 : p + 5] == IGNORE)


def test_offsets_too_few_images_raises():
    b = DreamLLMBuilder(OffsetToy(), CFG)
    with pytest.raises(ValueError):
        b.build(ConversationSample(messages=[
            Message("user", "a <image> and <image>"),
            Message("assistant", "ok"),
        ], images=[np.zeros((8, 8, 3), np.float32)]))


def test_real_hf_fast_tokenizer_roundtrip():
    """With an actual HF fast tokenizer (built in-memory via tokenizers),
    offsets must cover the whole assistant span."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(vocab_size=200, special_tokens=["<unk>"])
    tok.train_from_iterator(
        ["USER ASSISTANT what is this it is a cat definitely yes sure chat "
         "between curious artificial intelligence assistant gives helpful "
         "detailed polite answers questions"],
        trainer,
    )

    class Wrap:
        def encode(self, text):
            return tok.encode(text).ids

        def encode_with_offsets(self, text):
            e = tok.encode(text)
            return e.ids, e.offsets

        def decode(self, ids):
            return tok.decode(ids)

    b = DreamLLMBuilder(Wrap(), CFG)
    s = b.build(ConversationSample(messages=[
        Message("user", "what is this"),
        Message("assistant", "it is a cat"),
    ]))
    learn = (s.labels != IGNORE).sum()
    assert learn >= 4  # "it is a cat" + sep/eos territory
    # user question tokens masked: find a token that only appears in the
    # user turn ("what") and check it
    what_id = tok.encode("what").ids[0]
    pos = np.where(s.input_ids == what_id)[0]
    assert len(pos) >= 1 and np.all(s.labels[pos] == IGNORE)
