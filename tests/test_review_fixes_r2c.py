"""Regression tests for the round-1-core review findings (builder RGBA,
video caption truncation, packed SDXL time_ids, interleaved stop tokens)."""

import numpy as np
import pytest

from dreamllm_tpu.data.builder import BuilderConfig, DreamLLMBuilder, _to_float01
from dreamllm_tpu.data.collator import collate_packed, pack_samples
from dreamllm_tpu.data.dataset_types import ImageTextPair, VideoTextPair
from dreamllm_tpu.models.dreamllm import SpecialTokens

ST = SpecialTokens()


class ToyTok:
    def encode(self, text):
        return [10 + (hash(w) % 1000) for w in text.split()]


def _builder(**kw):
    cfg = BuilderConfig(
        max_seq_len=kw.pop("max_seq_len", 64),
        image_embed_len=4, n_dream_queries=3, max_images=4,
        image_size=8, image_size_dm=8, **kw,
    )
    return DreamLLMBuilder(ToyTok(), cfg)


def test_to_float01_rgba_composites_over_white():
    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[..., 0] = 255          # pure red
    rgba[..., 3] = 0            # fully transparent
    out = _to_float01(rgba)
    assert out.shape == (4, 4, 3)
    np.testing.assert_allclose(out, 1.0)  # transparent -> white, not red
    rgba[..., 3] = 255
    out = _to_float01(rgba)
    np.testing.assert_allclose(out[..., 0], 1.0)
    np.testing.assert_allclose(out[..., 1], 0.0)


def test_to_float01_la():
    la = np.zeros((4, 4, 2), np.uint8)
    la[..., 0] = 128
    la[..., 1] = 255
    out = _to_float01(la)
    assert out.shape == (4, 4, 3)
    np.testing.assert_allclose(out, 128 / 255, rtol=1e-5)


def test_rgba_image_through_builder():
    b = _builder()
    rgba = np.random.default_rng(0).integers(0, 255, (8, 8, 4), np.uint8)
    s = b.build(ImageTextPair(image=rgba, text="a b c"))
    assert (len(s.images) + len(s.images_dm)) == 1  # built without crashing


def test_video_long_caption_keeps_frames():
    b = _builder(max_seq_len=32)
    frames = [np.zeros((8, 8, 3), np.float32)] * 2
    long_text = " ".join(f"w{i}" for i in range(100))  # encodes way past 32
    s = b.build(VideoTextPair(frames=frames, text=long_text))
    # caption truncates FIRST so at least one frame span is admitted
    assert len(s.images) >= 1
    assert len(s.input_ids) <= 32


def test_pack_samples_carries_add_time_ids():
    from dreamllm_tpu.data.builder import BuiltSample

    def mk(n, tids):
        ids = np.arange(n, dtype=np.int32)
        return BuiltSample(
            input_ids=ids, labels=ids.copy(),
            images=[], image_positions=[],
            images_dm=[np.zeros((8, 8, 3), np.float32)],
            dream_positions=[1],
            add_time_ids=tids,
        )

    a = mk(10, [[256, 256, 0, 0, 256, 256]])
    c = mk(8, [])  # non-SDXL sample in the same row
    packed = pack_samples([a, c], 32, image_embed_len=4, n_dream_queries=3)
    assert len(packed) == 1
    row = packed[0]
    assert len(row.add_time_ids) == len(row.images_dm) == 2
    # alignment survives mixing: a's tids pair with a's image
    got = [t for t in row.add_time_ids if t is not None]
    assert got == [[256, 256, 0, 0, 256, 256]]
    out = collate_packed([row], seq_len=32, image_embed_len=4,
                         n_dream_queries=3, image_size_dm=8)
    tid_rows = np.asarray(out["add_time_ids"][0])
    assert any(np.array_equal(r, [256, 256, 0, 0, 256, 256]) for r in tid_rows)


@pytest.mark.slow
def test_interleaved_user_stop_token_halts_and_keeps_token():
    import jax
    import jax.numpy as jnp

    from dreamllm_tpu.generation.interleaved import (
        InterleavedConfig,
        generate_interleaved,
    )
    from dreamllm_tpu.generation.sampler import SamplingConfig
    from dreamllm_tpu.models.clip import CLIPVisionConfig
    from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params
    from dreamllm_tpu.models.llama import LlamaConfig
    from dreamllm_tpu.models.projector import ProjectorConfig
    from dreamllm_tpu.models.sd import UNetConfig, VAEConfig
    from dreamllm_tpu.models.sd.head import SDHeadConfig, init_sd_head_params

    cfg = DreamLLMConfig(
        llm=LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=1, num_attention_heads=2,
                        num_key_value_heads=2, max_position_embeddings=256),
        vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                num_hidden_layers=1, num_attention_heads=2,
                                image_size=28, patch_size=14),
        vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
        n_dream_queries=2, image_embed_len=4,
    )
    head_cfg = SDHeadConfig(
        unet=UNetConfig(sample_size=8, block_out_channels=(8, 16),
                        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                        layers_per_block=1, transformer_layers_per_block=(1, 1),
                        num_attention_heads=(2, 2), cross_attention_dim=16,
                        norm_num_groups=4),
        vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4),
        llm_hidden_size=32,
        projector=ProjectorConfig(projector_type="linear", in_dim=32, out_dim=16),
    )
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
    params["sd_head"] = init_sd_head_params(jax.random.PRNGKey(1), head_cfg)

    # find what greedy emits unconstrained, then declare the 3rd generated
    # token a stop token and check the halt keeps it
    base = generate_interleaved(
        params, cfg, params["sd_head"], head_cfg,
        jnp.asarray([[1, 7, 9]], jnp.int32),
        InterleavedConfig(max_new_tokens=8, max_images=0,
                          sampling=SamplingConfig(greedy=True, eos_token_id=-1)),
        jax.random.PRNGKey(2),
    )
    text = np.concatenate([np.asarray(t) for k, t in base["segments"] if k == "text"])
    assert len(text) == 8
    stop = int(text[2])
    out = generate_interleaved(
        params, cfg, params["sd_head"], head_cfg,
        jnp.asarray([[1, 7, 9]], jnp.int32),
        InterleavedConfig(max_new_tokens=8, max_images=0,
                          sampling=SamplingConfig(greedy=True, eos_token_id=-1,
                                                  stop_tokens=(stop,))),
        jax.random.PRNGKey(2),
    )
    text2 = np.concatenate([np.asarray(t) for k, t in out["segments"] if k == "text"])
    assert list(text2) == list(text[:3])  # halted AT the stop token, kept
