"""DreamLLM core: splicing correctness, dream-span extraction, joint loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import (
    DreamLLMConfig,
    SpecialTokens,
    canonical_dream_sequence,
    dreamllm_forward,
    extract_dream_hidden,
    init_dreamllm_params,
    masked_cross_entropy,
    multimodal_embed,
    param_freeze_mask,
    unconditional_dream_hidden,
)
from dreamllm_tpu.models.llama import LlamaConfig
from dreamllm_tpu.models.projector import ProjectorConfig


def tiny_cfg(**kw):
    llm = LlamaConfig(
        vocab_size=40000,  # > special token ids
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    vision = CLIPVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, image_size=8, patch_size=4,
    )
    defaults = dict(
        llm=llm,
        vision=vision,
        vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
        n_dream_queries=4,
        image_embed_len=4,  # (8/4)^2
    )
    defaults.update(kw)
    return DreamLLMConfig(**defaults)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_batch(cfg, b=2, s=32, n_img=1, n_dream=1, rng_seed=0):
    st = cfg.special_tokens
    rng = np.random.default_rng(rng_seed)
    ids = rng.integers(10, 1000, size=(b, s))
    image_positions = np.full((b, n_img), -1, np.int32)
    dream_positions = np.full((b, n_dream), -1, np.int32)
    # place an image span at offset 2 and a dream span at 2+258 for sample 0
    for bi in range(b):
        p = 2
        ids[bi, p - 1] = st.im_start
        ids[bi, p : p + cfg.image_embed_len] = st.im_patch
        ids[bi, p + cfg.image_embed_len] = st.im_end
        image_positions[bi, 0] = p
        q = p + cfg.image_embed_len + 2
        ids[bi, q - 1] = st.dream_start
        ids[bi, q : q + cfg.n_dream_queries] = st.dream
        ids[bi, q + cfg.n_dream_queries] = st.dream_end
        dream_positions[bi, 0] = q
    images = rng.standard_normal(
        (b, n_img, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    labels = ids.copy()
    labels[labels >= 32000] = -100  # mask special tokens
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "images": jnp.asarray(images),
        "image_positions": jnp.asarray(image_positions),
        "dream_positions": jnp.asarray(dream_positions),
    }


class TestSplicing:
    def test_image_and_dream_spans_replaced(self, model):
        cfg, params = model
        batch = make_batch(cfg)
        embeds = multimodal_embed(
            params, cfg, batch["input_ids"],
            images=batch["images"],
            image_positions=batch["image_positions"],
            dream_positions=batch["dream_positions"],
        )
        token_embeds = jnp.take(params["llm"]["embed_tokens"], batch["input_ids"], axis=0)
        e, t = np.asarray(embeds), np.asarray(token_embeds)
        # inside image span: replaced
        assert not np.allclose(e[0, 2:6], t[0, 2:6])
        # dream span: equals the learned queries
        q = np.asarray(params["dream_embedding"]["queries"])
        np.testing.assert_allclose(e[0, 8:12], q, rtol=1e-6)
        # outside spans: untouched
        np.testing.assert_allclose(e[0, 0:1], t[0, 0:1])
        np.testing.assert_allclose(e[0, 13:], t[0, 13:])

    def test_absent_spans_leave_embeds_untouched(self, model):
        cfg, params = model
        batch = make_batch(cfg)
        embeds = multimodal_embed(
            params, cfg, batch["input_ids"],
            images=batch["images"],
            image_positions=jnp.full_like(batch["image_positions"], -1),
            dream_positions=jnp.full_like(batch["dream_positions"], -1),
        )
        token_embeds = jnp.take(params["llm"]["embed_tokens"], batch["input_ids"], axis=0)
        np.testing.assert_allclose(np.asarray(embeds), np.asarray(token_embeds), rtol=1e-6)

    def test_splice_is_jittable(self, model):
        cfg, params = model
        batch = make_batch(cfg)

        @jax.jit
        def f(p, b):
            return multimodal_embed(
                p, cfg, b["input_ids"], images=b["images"],
                image_positions=b["image_positions"], dream_positions=b["dream_positions"],
            )

        out = f(params, batch)
        assert out.shape == (2, 32, cfg.llm.hidden_size)


class TestDreamExtraction:
    def test_extract_roundtrip(self):
        hidden = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
        pos = jnp.asarray([[4], [-1]], jnp.int32)
        cond, valid = extract_dream_hidden(hidden, pos, n_queries=3)
        assert cond.shape == (2, 1, 3, 3)
        assert bool(valid[0, 0]) and not bool(valid[1, 0])
        np.testing.assert_allclose(np.asarray(cond[0, 0]), np.asarray(hidden[0, 4:7]))

    def test_unconditional_hidden_shape(self, model):
        cfg, params = model
        uncond = unconditional_dream_hidden(params, cfg)
        assert uncond.shape == (1, cfg.n_dream_queries, cfg.llm.hidden_size)
        seq = canonical_dream_sequence(cfg)
        assert seq.shape == (1, cfg.n_dream_queries + 4)


class TestLoss:
    def test_masked_ce_ignores_minus100(self):
        logits = jnp.zeros((1, 4, 8))
        labels = jnp.asarray([[1, 2, -100, 3]])
        loss = masked_cross_entropy(logits, labels)
        np.testing.assert_allclose(float(loss), np.log(8.0), rtol=1e-5)

    def test_joint_forward_lm_only(self, model):
        cfg, params = model
        batch = make_batch(cfg)
        loss, aux = dreamllm_forward(params, cfg, batch, use_flash=False)
        assert np.isfinite(float(loss))
        assert float(aux["lm_loss"]) > 0
        assert float(aux["vm_loss"]) == 0.0

    def test_joint_forward_with_fake_head(self, model):
        cfg, params = model
        batch = make_batch(cfg)
        batch["images_dm"] = jnp.zeros((2, 1, 8, 8, 3))

        def fake_head(hp, images_dm, cond, uncond, valid, rng):
            # mean-square of cond states over valid spans
            per = jnp.mean(cond**2, axis=(2, 3))
            loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1)
            return loss.astype(jnp.float32), {"fake": loss}

        loss, aux = dreamllm_forward(
            params, cfg, batch, head_loss_fn=fake_head, head_params={},
            rng=jax.random.PRNGKey(0), use_flash=False,
        )
        assert float(aux["vm_loss"]) > 0
        assert np.isfinite(float(loss))

    def test_grads_flow_and_freeze_mask(self, model):
        cfg, params = model
        batch = make_batch(cfg)

        def loss_fn(p):
            return dreamllm_forward(p, cfg, batch, use_flash=False)[0]

        grads = jax.grad(loss_fn)(params)
        gq = np.asarray(grads["dream_embedding"]["queries"])
        # dream queries only feed the LM loss through spliced embeds
        assert np.abs(gq).sum() > 0

        cfg2 = tiny_cfg(frozen=("clip_vision_embedding",))
        mask = param_freeze_mask(params, cfg2)
        assert mask["llm"]["final_norm"] is True or mask["llm"]["final_norm"] == True  # noqa: E712
        flat = jax.tree.leaves(mask["clip_vision_embedding"])
        assert all(x is False or x == False for x in flat)  # noqa: E712


class TestAuxFeatures:
    def test_log_hidden_states(self, model):
        cfg, params = model
        import dataclasses as dc
        cfg2 = dc.replace(cfg, log_hidden_states=True)
        batch = make_batch(cfg2)
        loss, aux = dreamllm_forward(params, cfg2, batch, use_flash=False)
        assert float(aux["hidden_absmax_max"]) > 0
        assert float(aux["hidden_absmax_mean"]) <= float(aux["hidden_absmax_max"])

    def test_loss_scale_divides_by_weight_norm(self, model):
        # reference loss_scale_schedule (modeling_dreamllm.py:1472-1477):
        # denominator is the norm of the constant loss WEIGHTS, not the loss
        # values (value-norm would renormalize the loss to ~1 every step)
        cfg, params = model
        import dataclasses as dc
        batch = make_batch(cfg)
        base = dc.replace(cfg, loss_weight_lm=3.0, loss_weight_vm=4.0)
        l0, _ = dreamllm_forward(params, base, batch, use_flash=False)
        l1, _ = dreamllm_forward(params, dc.replace(base, loss_scale="l1"), batch, use_flash=False)
        l2, _ = dreamllm_forward(params, dc.replace(base, loss_scale="l2"), batch, use_flash=False)
        np.testing.assert_allclose(float(l1), float(l0) / 7.0, rtol=1e-5)
        np.testing.assert_allclose(float(l2), float(l0) / 5.0, rtol=1e-5)
