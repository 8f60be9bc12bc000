"""Data pipeline tests: builder label semantics (the reference's exact
masking rules), collation shapes, mixing, tar streaming, end-to-end batch →
model forward."""

import io
import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.data import (
    BuilderConfig,
    ConversationSample,
    DreamLLMBuilder,
    ImageTextPair,
    InterleavedImageText,
    Message,
    MixedDataset,
    collate,
)
from dreamllm_tpu.data.builder import IGNORE
from dreamllm_tpu.data.registry import DataManager, DATASETS, register_dataset
from dreamllm_tpu.data.tokenization import ToyTokenizer
from dreamllm_tpu.data.webdataset import ShardStream, group_tar_entries
from dreamllm_tpu.models.dreamllm import SpecialTokens

CFG = BuilderConfig(
    max_seq_len=128,
    image_embed_len=4,
    n_dream_queries=4,
    max_images=2,
    max_dreams=2,
    image_size=8,
    image_size_dm=16,
)
ST = CFG.special


def make_builder(i2t=None, seed=0):
    cfg = CFG
    if i2t is not None:
        cfg = BuilderConfig(**{**CFG.__dict__, "i2t_probability": 1.0 if i2t else 0.0})
    return DreamLLMBuilder(ToyTokenizer(), cfg, seed=seed)


def img(v=0.5, size=12):
    return np.full((size, size, 3), v, np.float32)


class TestPairBuilder:
    def test_i2t_labels(self):
        b = make_builder(i2t=True)
        s = b.build(ImageTextPair(image=img(), text="a cat sat"))
        ids, labels = s.input_ids, s.labels
        assert ids[0] == ST.bos and ids[-1] == ST.eos
        # image span right after bos
        assert ids[1] == ST.im_start and ids[6] == ST.im_end
        assert s.image_positions == [2]
        # span + bos masked, caption + eos learnable
        assert np.all(labels[:7] == IGNORE)
        assert np.all(labels[7:10] != IGNORE)
        assert labels[-1] == ST.eos
        assert len(s.images) == 1 and s.images[0].shape == (8, 8, 3)

    def test_t2i_all_labels_ignored(self):
        b = make_builder(i2t=False)
        s = b.build(ImageTextPair(image=img(), text="a cat sat"))
        assert np.all(s.labels == IGNORE)
        assert len(s.images_dm) == 1 and s.images_dm[0].shape == (16, 16, 3)
        # dream span after caption: bos + 3 caption tokens, then dream_start
        assert s.input_ids[4] == ST.dream_start
        assert s.dream_positions == [5]
        # dm image in [-1, 1]
        assert s.images_dm[0].min() >= -1 and s.images_dm[0].max() <= 1


class TestInterleavedBuilder:
    def test_dream_start_is_only_learnable_special(self):
        b = make_builder()
        s = b.build(InterleavedImageText(
            texts=["first chunk", "second chunk here"],
            images=[img(0.3)],
            matched_text_index=[0],
        ))
        ids, labels = s.input_ids, s.labels
        # creation + comprehension spans both present
        assert len(s.dream_positions) == 1 and len(s.image_positions) == 1
        ds_pos = s.dream_positions[0] - 1  # position of <dream_start>
        assert ids[ds_pos] == ST.dream_start
        assert labels[ds_pos] == ST.dream_start  # learnable!
        # every other special token masked
        special = np.isin(ids, [ST.im_patch, ST.im_start, ST.im_end, ST.dream_end])
        assert np.all(labels[special] == IGNORE)
        # text learnable
        text_mask = (labels != IGNORE) & ~np.isin(ids, [ST.dream_start, ST.eos])
        assert text_mask.sum() == 5  # 2 + 3 words

    def test_image_and_dream_use_same_image(self):
        b = make_builder()
        s = b.build(InterleavedImageText(
            texts=["chunk"], images=[img(0.7)], matched_text_index=[0],
        ))
        assert s.images[0].shape == (8, 8, 3)
        assert s.images_dm[0].shape == (16, 16, 3)
        # CLIP inputs are mean/std-normalized in the builder (train path must
        # match the clip_preprocess inference paths)
        from dreamllm_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
        np.testing.assert_allclose(
            s.images[0][0, 0, 0], (0.7 - CLIP_IMAGE_MEAN[0]) / CLIP_IMAGE_STD[0],
            rtol=1e-5,
        )
        np.testing.assert_allclose(s.images_dm[0][0, 0, 0], 0.7 * 2 - 1)

    def test_caps_respected(self):
        b = make_builder()
        s = b.build(InterleavedImageText(
            texts=["a"] * 5, images=[img()] * 5, matched_text_index=[0, 1, 2, 3, 4],
        ))
        assert len(s.images) <= CFG.max_images
        assert len(s.images_dm) <= CFG.max_dreams


class TestConversationBuilder:
    def test_only_assistant_learnable(self):
        b = make_builder()
        s = b.build(ConversationSample(messages=[
            Message("user", "what is this <image> thing"),
            Message("assistant", "it is a cat"),
            Message("user", "really"),
            Message("assistant", "yes truly"),
        ], images=[img()]))
        ids, labels = s.input_ids, s.labels
        assert len(s.image_positions) == 1
        # image span masked
        span = np.isin(ids, [ST.im_patch, ST.im_start, ST.im_end])
        assert np.all(labels[span] == IGNORE)
        # some learnable tokens exist (assistant replies)
        n_learn = (labels != IGNORE).sum()
        assert 0 < n_learn < len(ids)

    def test_too_few_images_raises(self):
        b = make_builder()
        with pytest.raises(ValueError):
            b.build(ConversationSample(messages=[
                Message("user", "look <image> and <image>"),
                Message("assistant", "ok"),
            ], images=[img()]))


class TestCollate:
    def test_fixed_shapes_and_padding(self):
        b = make_builder(i2t=True)
        s1 = b.build(ImageTextPair(image=img(), text="one two three"))
        b2 = make_builder(i2t=False)
        s2 = b2.build(ImageTextPair(image=img(), text="x"))
        batch = collate([s1, s2], seq_len=64, max_images=2, max_dreams=2,
                        image_size=8, image_size_dm=16,
                        image_embed_len=4, n_dream_queries=4)
        assert batch["input_ids"].shape == (2, 64)
        assert batch["images"].shape == (2, 2, 8, 8, 3)
        assert batch["images_dm"].shape == (2, 2, 16, 16, 3)
        # sample 1 has an image at slot 0, no dream; sample 2 the reverse
        assert batch["image_positions"][0, 0] >= 0
        assert batch["image_positions"][1, 0] == -1
        assert batch["dream_positions"][0, 0] == -1
        assert batch["dream_positions"][1, 0] >= 0
        # padding: seg 0 beyond length
        n1 = len(s1.input_ids)
        assert batch["segment_ids"][0, n1 - 1] == 1
        assert batch["segment_ids"][0, n1] == 0

    def test_batch_feeds_model(self):
        from dreamllm_tpu.models.clip import CLIPVisionConfig
        from dreamllm_tpu.models.dreamllm import (
            DreamLLMConfig, dreamllm_forward, init_dreamllm_params,
        )
        from dreamllm_tpu.models.llama import LlamaConfig
        from dreamllm_tpu.models.projector import ProjectorConfig

        b = make_builder()
        samples = [
            b.build(InterleavedImageText(texts=["hello world"], images=[img()],
                                         matched_text_index=[0])),
            b.build(ImageTextPair(image=img(), text="caption words here")),
        ]
        batch = collate(samples, seq_len=64, max_images=2, max_dreams=2,
                        image_size=8, image_size_dm=16,
                        image_embed_len=4, n_dream_queries=4)
        cfg = DreamLLMConfig(
            llm=LlamaConfig(vocab_size=40000, hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, max_position_embeddings=128),
            vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                    num_hidden_layers=2, num_attention_heads=2,
                                    image_size=8, patch_size=4),
            vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
            n_dream_queries=4, image_embed_len=4,
        )
        params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        loss, aux = dreamllm_forward(params, cfg, jb, use_flash=False)
        assert np.isfinite(float(loss)) and float(aux["lm_loss"]) > 0


class TestMixing:
    def test_mixed_routing_and_oversampling(self):
        a = ["a0", "a1"]
        c = ["c0", "c1", "c2"]
        m = MixedDataset([a, c], [4, 3])
        assert len(m) == 7
        assert [m[i] for i in range(7)] == ["a0", "a1", "a0", "a1", "c0", "c1", "c2"]

    def test_manager_ratios(self):
        if "toy_a" not in DATASETS:
            register_dataset("toy_a", lambda: ["a"] * 2)
            register_dataset("toy_b", lambda: ["b"] * 2)
        dm = DataManager()
        mixed = dm(["toy_a", "toy_b"], ratios=[3, 1], total_size=8)
        vals = [mixed[i] for i in range(len(mixed))]
        assert vals.count("a") == 6 and vals.count("b") == 2


class TestWebdataset:
    def _make_tar(self, tmp_path, n=5):
        path = os.path.join(tmp_path, "shard-000.tar")
        with tarfile.open(path, "w") as tf:
            for i in range(n):
                for ext, data in (
                    ("txt", f"caption {i}".encode()),
                    ("json", b'{"k": %d}' % i),
                ):
                    b = io.BytesIO(data)
                    ti = tarfile.TarInfo(f"{i:05d}.{ext}")
                    ti.size = len(data)
                    tf.addfile(ti, b)
        return path

    def test_group_and_decode(self, tmp_path):
        path = self._make_tar(str(tmp_path))
        groups = list(group_tar_entries(path))
        assert len(groups) == 5
        assert groups[0]["__key__"] == "00000"
        assert b"caption 0" == groups[0]["txt"]

    def test_stream_single_epoch(self, tmp_path):
        path = self._make_tar(str(tmp_path))
        stream = ShardStream([path], shuffle_buffer=2, resample=False)
        out = list(stream)
        assert len(out) == 5
        assert {s["txt"] for s in out} == {f"caption {i}" for i in range(5)}

    def test_filters_and_fault_tolerance(self, tmp_path):
        path = self._make_tar(str(tmp_path))

        def bad_decoder(s):
            if s["__key__"] == "00002":
                raise ValueError("corrupt")
            from dreamllm_tpu.data.webdataset import default_decoder
            return default_decoder(s)

        stream = ShardStream(
            [path], shuffle_buffer=1, resample=False, decoder=bad_decoder,
            filters=[lambda s: s["json"]["k"] != 4],
        )
        out = list(stream)
        # 5 - 1 corrupt - 1 filtered
        assert len(out) == 3


class TestInstructInterleavedBuilder:
    """Label semantics of the SFT data format (reference
    builder_dreamllm.py:290-356): conversation prefix fully masked,
    document text learnable, <dream_start> learnable, other special masked."""

    def _build(self):
        from dreamllm_tpu.data import InstructInterleavedImageText

        b = make_builder()
        s = b.build(InstructInterleavedImageText(
            texts=["first chunk words", "closing words"],
            images=[img(0.3)],
            matched_text_index=[0],
            instruction="write an illustrated story",
        ))
        return b, s

    def test_prefix_masked_document_learnable(self):
        from dreamllm_tpu.data.conversation import TEMPLATES, render_prompt
        from dreamllm_tpu.data.dataset_types import Message as Msg

        b, s = self._build()
        ids, labels = s.input_ids, s.labels
        prefix = render_prompt(TEMPLATES[CFG.conv_template],
                               [Msg("user", "write an illustrated story")])
        prefix_len = 1 + len(b.tok.encode(prefix))  # + bos
        # ENTIRE instruction prefix masked (reference :355-356)
        assert np.all(labels[:prefix_len] == IGNORE)
        # document text learnable after the prefix
        doc = labels[prefix_len:]
        assert (doc != IGNORE).sum() > 0
        # eos learnable
        assert labels[-1] == ST.eos

    def test_dream_start_learnable_other_special_masked(self):
        _, s = self._build()
        ids, labels = s.input_ids, s.labels
        assert len(s.dream_positions) == 1 and len(s.image_positions) == 1
        ds_pos = s.dream_positions[0] - 1
        assert ids[ds_pos] == ST.dream_start
        assert labels[ds_pos] == ST.dream_start  # learnable — model learns WHEN to emit
        special = np.isin(ids, [ST.im_patch, ST.im_start, ST.im_end, ST.dream_end])
        assert np.all(labels[special] == IGNORE)
        # image used both as creation target and comprehension input
        assert len(s.images) == 1 and len(s.images_dm) == 1

    def test_creation_only_and_comprehension_only_toggles(self):
        from dreamllm_tpu.data import InstructInterleavedImageText

        sample = InstructInterleavedImageText(
            texts=["chunk"], images=[img()], matched_text_index=[0],
            instruction="do it",
        )
        cfg_c = BuilderConfig(**{**CFG.__dict__, "use_comprehension": False})
        s = DreamLLMBuilder(ToyTokenizer(), cfg_c).build(sample)
        assert len(s.images) == 0 and len(s.images_dm) == 1
        cfg_k = BuilderConfig(**{**CFG.__dict__, "use_creation": False})
        s = DreamLLMBuilder(ToyTokenizer(), cfg_k).build(sample)
        assert len(s.images) == 1 and len(s.images_dm) == 0


class TestIIPair:
    def test_image_image_pair(self):
        from dreamllm_tpu.data.dataset_types import ImageImagePair

        b = make_builder()
        s = b.build(ImageImagePair(source=img(0.2), target=img(0.8), text="make it bright"))
        assert len(s.images) == 1 and len(s.images_dm) == 1
        from dreamllm_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
        np.testing.assert_allclose(
            s.images[0][0, 0, 0], (0.2 - CLIP_IMAGE_MEAN[0]) / CLIP_IMAGE_STD[0],
            rtol=1e-5,
        )
        np.testing.assert_allclose(s.images_dm[0][0, 0, 0], 0.8 * 2 - 1)
        ids, labels = s.input_ids, s.labels
        ds_pos = s.dream_positions[0] - 1
        assert ids[ds_pos] == ST.dream_start
        # ii-pair is a PURE-creation sample: every LM label masked, loss
        # comes from the diffusion head (reference builder_dreamllm.py:160)
        assert np.all(labels == IGNORE)


class TestCatalogWds:
    def test_real_shard_factory(self, tmp_path, monkeypatch):
        import io, tarfile
        from PIL import Image
        root = tmp_path / "laion400m"
        root.mkdir()
        with tarfile.open(str(root / "00000.tar"), "w") as tf:
            for i in range(3):
                buf = io.BytesIO()
                Image.fromarray(np.full((8, 8, 3), i * 50, np.uint8)).save(buf, "JPEG")
                d = buf.getvalue()
                ti = tarfile.TarInfo(f"{i:05d}.jpg"); ti.size = len(d)
                tf.addfile(ti, io.BytesIO(d))
                c = f"cap {i}".encode()
                ti = tarfile.TarInfo(f"{i:05d}.txt"); ti.size = len(c)
                tf.addfile(ti, io.BytesIO(c))
        monkeypatch.setenv("DREAMLLM_DATA_ROOT", str(tmp_path))
        import dreamllm_tpu.data.catalog  # noqa: F401
        ds = DATASETS["laion400m"].build(shuffle_buffer=1, resample=False)
        s = ds[0]
        assert s.text.startswith("cap") and s.image.shape == (8, 8, 3)


class TestLlama2ChatTemplate:
    """String parity of the llama2 template vs the reference's jinja
    default_chat_template (tokenization_dreamllm.py:400-448)."""

    # the documented output shape: <bos>[INST] Sys+Q [/INST] A <eos> per turn
    _JINJA = (
        "{% if messages[0]['role'] == 'system' %}"
        "{% set loop_messages = messages[1:] %}"
        "{% set system_message = messages[0]['content'] %}"
        "{% else %}"
        "{% set loop_messages = messages %}"
        "{% set system_message = false %}"
        "{% endif %}"
        "{% for message in loop_messages %}"
        "{% if loop.index0 == 0 and system_message != false %}"
        "{% set content = '<<SYS>>\n' + system_message + '\n<</SYS>>\n\n' + message['content'] %}"
        "{% else %}"
        "{% set content = message['content'] %}"
        "{% endif %}"
        "{% if message['role'] == 'user' %}"
        "{{ bos_token + '[INST] ' + content.strip() + ' [/INST]' }}"
        "{% elif message['role'] == 'assistant' %}"
        "{{ ' '  + content.strip() + ' ' + eos_token }}"
        "{% endif %}"
        "{% endfor %}"
    )

    def _golden(self, messages):
        import jinja2

        t = jinja2.Environment().from_string(self._JINJA)
        return t.render(messages=messages, bos_token="<s>", eos_token="</s>")

    def _ours(self, messages, system=None):
        from dreamllm_tpu.data.conversation import TEMPLATES, render_conversation

        segs = render_conversation(TEMPLATES["llama2"], messages, system=system)
        # builder prepends the bos token id; the jinja string carries it inline
        return "<s>" + "".join(s.text for s in segs)

    def test_multi_turn_with_system(self):
        msgs = [
            {"role": "system", "content": "Be helpful."},
            {"role": "user", "content": "hello there"},
            {"role": "assistant", "content": "hi!"},
            {"role": "user", "content": "and now?"},
            {"role": "assistant", "content": "done."},
        ]
        ours = self._ours(
            [Message(m["role"], m["content"]) for m in msgs[1:]], system="Be helpful."
        )
        assert ours == self._golden(msgs)

    def test_no_system(self):
        msgs = [
            {"role": "user", "content": "q1"},
            {"role": "assistant", "content": "a1"},
        ]
        ours = self._ours([Message(m["role"], m["content"]) for m in msgs], system="")
        assert ours == self._golden(msgs)

    def test_assistant_segments_learnable_only(self):
        from dreamllm_tpu.data.conversation import TEMPLATES, render_conversation

        segs = render_conversation(
            TEMPLATES["llama2"],
            [Message("user", "q"), Message("assistant", "a")],
            system="s",
        )
        assert [s.learnable for s in segs] == [False, True]
        assert segs[1].text == " a </s>"


class TestCatalogCoverage:
    def test_all_reference_corpora_registered(self):
        """Every name in the reference's DATASETS_INFO_TABLE
        (omni/data/constants.py:43-232) resolves in our catalog."""
        import dreamllm_tpu.data.catalog  # noqa: F401

        reference_names = [
            "laion_coco", "laion2b_en", "laion400m", "blip_laion",
            "laion400m_orig", "journeydb", "pokemon-gpt4-captions",
            "dalle3-by-laion", "laion_coco_ii", "blip_laion_ii", "mmc4_core",
            "obelics", "mmc4_instruct_filtered224", "webvid", "llava_pretrain",
            "gqa", "llava_instruct", "llavav1.5_instruct",
            "llava_instruct_filter", "instruct_blip_laion",
        ]
        missing = [n for n in reference_names if n not in DATASETS]
        assert not missing, missing

    def test_ii_pair_factory(self, tmp_path, monkeypatch):
        import io, tarfile
        from PIL import Image
        from dreamllm_tpu.data.dataset_types import ImageImagePair

        root = tmp_path / "laion-coco"
        root.mkdir()
        with tarfile.open(str(root / "00000.tar"), "w") as tf:
            for i in range(2):
                buf = io.BytesIO()
                Image.fromarray(np.full((8, 8, 3), 40 + i * 60, np.uint8)).save(buf, "JPEG")
                d = buf.getvalue()
                ti = tarfile.TarInfo(f"{i:05d}.jpg"); ti.size = len(d)
                tf.addfile(ti, io.BytesIO(d))
                t = f"cap {i}".encode()
                ti = tarfile.TarInfo(f"{i:05d}.txt"); ti.size = len(t)
                tf.addfile(ti, io.BytesIO(t))
        monkeypatch.setenv("DREAMLLM_DATA_ROOT", str(tmp_path))
        import dreamllm_tpu.data.catalog  # noqa: F401

        ds = DATASETS["laion_coco_ii"].factory()
        s = ds[0]
        assert isinstance(s, ImageImagePair)
        # single-image shard: source doubles as target
        np.testing.assert_array_equal(np.asarray(s.source), np.asarray(s.target))
        assert s.text.startswith("cap")
