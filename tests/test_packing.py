"""Sequence-packing tests: packed rows must produce identical per-sample
hidden states to unpacked rows (segment isolation), spans must relocate."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.data import BuilderConfig, DreamLLMBuilder, ImageTextPair
from dreamllm_tpu.data.collator import collate_packed, pack_samples
from dreamllm_tpu.data.tokenization import ToyTokenizer
from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params, multimodal_embed
from dreamllm_tpu.models.llama import LlamaConfig, llama_forward
from dreamllm_tpu.models.projector import ProjectorConfig

CFG_B = BuilderConfig(
    max_seq_len=64, image_embed_len=4, n_dream_queries=4,
    max_images=2, max_dreams=2, image_size=8, image_size_dm=16,
    i2t_probability=1.0,
)


def img(v):
    return np.full((8, 8, 3), v, np.float32)


def build_samples(n=4):
    b = DreamLLMBuilder(ToyTokenizer(), CFG_B, seed=0)
    return [
        b.build(ImageTextPair(image=img(0.1 * (i + 1)), text=f"caption number {i} here"))
        for i in range(n)
    ]


class TestPacking:
    def test_pack_reduces_rows(self):
        samples = build_samples(4)  # each ~15 tokens; 64-token rows fit 4
        packed = pack_samples(samples, seq_len=64, image_embed_len=4, n_dream_queries=4)
        assert len(packed) < len(samples)
        total_before = sum(len(s.input_ids) for s in samples)
        total_after = sum(len(p.input_ids) for p in packed)
        assert total_after == total_before  # nothing dropped

    def test_segments_distinct_and_positions_reset(self):
        samples = build_samples(3)
        packed = pack_samples(samples, seq_len=64, image_embed_len=4, n_dream_queries=4)
        row = packed[0]
        segs = row.segments
        assert segs.min() >= 1
        # each segment's positions restart at 0
        for s_id in np.unique(segs):
            pos = row.positions[segs == s_id]
            assert pos[0] == 0
            assert np.all(np.diff(pos) == 1)

    def test_image_positions_relocated(self):
        samples = build_samples(3)
        packed = pack_samples(samples, seq_len=64, image_embed_len=4, n_dream_queries=4)
        row = packed[0]
        st = CFG_B.special
        for p in row.image_positions:
            # position points at the first <im_patch> (start token right before)
            assert row.input_ids[p] == st.im_patch
            assert row.input_ids[p - 1] == st.im_start

    def test_packed_forward_matches_unpacked(self):
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
        samples = build_samples(2)

        # unpacked reference per sample
        refs = []
        for s in samples:
            batch = collate_packed([s], seq_len=64, max_images=2, max_dreams=2,
                                   image_size=8, image_size_dm=16,
                                   image_embed_len=4, n_dream_queries=4)
            e = multimodal_embed(
                params, cfg, jnp.asarray(batch["input_ids"]),
                images=jnp.asarray(batch["images"]),
                image_positions=jnp.asarray(batch["image_positions"]),
            )
            h = llama_forward(
                params["llm"], cfg.llm, inputs_embeds=e,
                segment_ids=jnp.asarray(batch["segment_ids"]),
                positions=jnp.asarray(batch["positions"]),
                use_flash=False,
            )["last_hidden_state"]
            refs.append(np.asarray(h[0, : len(s.input_ids)]))

        packed = pack_samples(samples, seq_len=64, image_embed_len=4, n_dream_queries=4)
        assert len(packed) == 1
        batch = collate_packed(packed, seq_len=64, max_images=4, max_dreams=2,
                               image_size=8, image_size_dm=16,
                               image_embed_len=4, n_dream_queries=4)
        e = multimodal_embed(
            params, cfg, jnp.asarray(batch["input_ids"]),
            images=jnp.asarray(batch["images"]),
            image_positions=jnp.asarray(batch["image_positions"]),
        )
        h = np.asarray(llama_forward(
            params["llm"], cfg.llm, inputs_embeds=e,
            segment_ids=jnp.asarray(batch["segment_ids"]),
            positions=jnp.asarray(batch["positions"]),
            use_flash=False,
        )["last_hidden_state"][0])

        segs = batch["segment_ids"][0]
        # order in the packed row may differ (longest-first); match by length
        for s, ref in zip(samples, refs):
            n = len(s.input_ids)
            matched = False
            for s_id in np.unique(segs[segs > 0]):
                mask = segs == s_id
                if mask.sum() == n:
                    got = h[mask]
                    if np.allclose(got, ref, rtol=2e-4, atol=2e-4):
                        matched = True
                        break
            assert matched, f"no packed segment matched sample of len {n}"
