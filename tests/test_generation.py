"""Decode loop tests: greedy determinism vs step-by-step reference, EOS/stop
handling, top-p/top-k samplers, interleaved text+image generation."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.generation import (
    InterleavedConfig,
    SamplingConfig,
    generate_interleaved,
    generate_text,
    sample_token,
)
from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward, llama_logits
from dreamllm_tpu.models.projector import ProjectorConfig
from dreamllm_tpu.models.sd import UNetConfig, VAEConfig
from dreamllm_tpu.models.sd.head import SDHeadConfig, init_sd_head_params
import pytest

TINY = dict(
    vocab_size=40000,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=256,
)


class TestSampleToken:
    def test_greedy_argmax(self):
        logits = jnp.asarray([[0.0, 5.0, 1.0]])
        cfg = SamplingConfig(greedy=True)
        assert int(sample_token(logits, jax.random.PRNGKey(0), cfg)[0]) == 1

    def test_top_k_restricts_support(self):
        logits = jnp.asarray([[0.0, 10.0, 9.0, -5.0]])
        cfg = SamplingConfig(top_k=2, temperature=1.0)
        toks = [
            int(sample_token(logits, jax.random.PRNGKey(i), cfg)[0]) for i in range(30)
        ]
        assert set(toks) <= {1, 2}

    def test_top_p_keeps_top1_at_least(self):
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        cfg = SamplingConfig(top_p=0.01)
        toks = {int(sample_token(logits, jax.random.PRNGKey(i), cfg)[0]) for i in range(20)}
        assert toks == {0}


class TestGenerateText:
    def setup_method(self):
        self.cfg = LlamaConfig(**TINY)
        self.params = init_llama_params(jax.random.PRNGKey(0), self.cfg)

    def _stepwise_greedy(self, ids, n):
        """Reference: full forward from scratch each step."""
        toks = []
        cur = ids
        for _ in range(n):
            h = llama_forward(self.params, self.cfg, input_ids=cur, use_flash=False)[
                "last_hidden_state"
            ]
            lg = llama_logits(self.params, self.cfg, h[:, -1:])[:, 0]
            t = int(jnp.argmax(lg, axis=-1)[0])
            toks.append(t)
            cur = jnp.concatenate([cur, jnp.asarray([[t]], cur.dtype)], axis=1)
        return toks

    def test_greedy_matches_stepwise_full_forward(self):
        ids = jnp.asarray([[5, 17, 300, 42]])
        golden = self._stepwise_greedy(ids, 6)
        out = generate_text(
            self.params, self.cfg, ids, jnp.asarray([4]),
            SamplingConfig(greedy=True, max_new_tokens=6),
            cache_dtype=jnp.float32,
        )
        got = np.asarray(out["tokens"][0]).tolist()
        assert got == golden

    def test_padded_batch_matches_unpadded(self):
        """Right padding must not change a sample's output."""
        a = jnp.asarray([[5, 17, 300, 42]])
        padded = jnp.asarray([[5, 17, 300, 42, 0, 0], [7, 9, 0, 0, 0, 0]])
        lens = jnp.asarray([4, 2])
        cfgs = SamplingConfig(greedy=True, max_new_tokens=5)
        single = generate_text(self.params, self.cfg, a, jnp.asarray([4]), cfgs,
                               cache_dtype=jnp.float32)
        batch = generate_text(self.params, self.cfg, padded, lens, cfgs,
                              cache_dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(single["tokens"][0]), np.asarray(batch["tokens"][0])
        )

    def test_eos_stops_and_pads(self):
        # force EOS: pick the token greedy decode emits first, call it EOS
        ids = jnp.asarray([[5, 17, 300, 42]])
        first = self._stepwise_greedy(ids, 2)
        out = generate_text(
            self.params, self.cfg, ids, jnp.asarray([4]),
            SamplingConfig(greedy=True, max_new_tokens=8, eos_token_id=first[1]),
            cache_dtype=jnp.float32,
        )
        toks = np.asarray(out["tokens"][0])
        assert toks[0] == first[0]
        assert np.all(toks[1:] == 0)  # eos not stored; rest padded
        assert int(out["lengths"][0]) == 1

    def test_stop_token_is_stored(self):
        ids = jnp.asarray([[5, 17, 300, 42]])
        first = self._stepwise_greedy(ids, 2)
        out = generate_text(
            self.params, self.cfg, ids, jnp.asarray([4]),
            SamplingConfig(greedy=True, max_new_tokens=8, stop_tokens=(first[1],)),
            cache_dtype=jnp.float32,
        )
        toks = np.asarray(out["tokens"][0])
        assert toks[0] == first[0] and toks[1] == first[1]
        assert np.all(toks[2:] == 0)


class TestInterleaved:
    @pytest.mark.slow
    def test_generates_image_on_dream_start(self):
        llm_cfg = LlamaConfig(**TINY)
        llm_params = init_llama_params(jax.random.PRNGKey(0), llm_cfg)
        # find the token greedy decode actually emits first, and declare THAT
        # to be <dream_start> — deterministic image-branch trigger.
        prompt = jnp.asarray([[5, 17, 300]])
        h = llama_forward(llm_params, llm_cfg, input_ids=prompt, use_flash=False)[
            "last_hidden_state"
        ]
        first = int(jnp.argmax(llama_logits(llm_params, llm_cfg, h[:, -1:])[:, 0], axis=-1)[0])
        assert first not in (0, 2)
        from dreamllm_tpu.models.dreamllm import SpecialTokens

        st = SpecialTokens(dream_start=first)
        cfg = DreamLLMConfig(
            llm=llm_cfg,
            special_tokens=st,
            vision=CLIPVisionConfig(
                hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                num_attention_heads=2, image_size=8, patch_size=4,
            ),
            vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
            n_dream_queries=4,
            image_embed_len=4,
        )
        params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
        params["llm"] = llm_params
        head_cfg = SDHeadConfig(
            unet=UNetConfig(
                sample_size=8, block_out_channels=(16, 32),
                down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                layers_per_block=1, transformer_layers_per_block=(1, 1),
                num_attention_heads=(2, 4), cross_attention_dim=24, norm_num_groups=4,
            ),
            vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4),
            llm_hidden_size=32,
            projector=ProjectorConfig(projector_type="linear", in_dim=32, out_dim=24),
        )
        head = init_sd_head_params(jax.random.PRNGKey(1), head_cfg)

        out = generate_interleaved(
            params, cfg, head, head_cfg,
            prompt,
            InterleavedConfig(
                max_new_tokens=8, max_images=1, num_inference_steps=2,
                image_height=16, image_width=16,
                sampling=SamplingConfig(greedy=True),
            ),
            jax.random.PRNGKey(2),
        )
        assert len(out["images"]) == 1
        img = np.asarray(out["images"][0])
        assert img.shape == (16, 16, 3)
        assert np.all(np.isfinite(img)) and img.min() >= 0 and img.max() <= 1
        kinds = [k for k, _ in out["segments"]]
        assert "image" in kinds
