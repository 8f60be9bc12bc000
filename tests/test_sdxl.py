"""SDXL head tests: dual conditioning, time ids, fp32 VAE policy, pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-suite only; fast tier: -m 'not slow'

from dreamllm_tpu.models.projector import ProjectorConfig
from dreamllm_tpu.models.sd import VAEConfig
from dreamllm_tpu.models.sd.sdxl import (
    SDXLHeadConfig,
    init_sdxl_head_params,
    make_add_time_ids,
    sdxl_head_loss,
    sdxl_head_pipeline,
)
from dreamllm_tpu.models.sd.unet import sdxl_unet_config

CFG = SDXLHeadConfig(
    unet=sdxl_unet_config(
        sample_size=8,
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        transformer_layers_per_block=(1, 1),
        num_attention_heads=(2, 4),
        cross_attention_dim=24,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=8 * 6 + 16,  # 6 time ids + pooled 16
        norm_num_groups=4,
        layers_per_block=1,
    ),
    vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4),
    llm_hidden_size=32,
    projector=ProjectorConfig(projector_type="linear", in_dim=32, out_dim=24),
    pooled_dim=16,
)


@pytest.fixture(scope="module")
def head():
    return init_sdxl_head_params(jax.random.PRNGKey(0), CFG)


def test_add_time_ids():
    ids = make_add_time_ids((1024, 1024), (0, 0), (1024, 1024), 3)
    assert ids.shape == (3, 6)
    np.testing.assert_allclose(np.asarray(ids[0]), [1024, 1024, 0, 0, 1024, 1024])


def test_vae_is_fp32(head):
    for leaf in jax.tree.leaves(head["vae"]):
        assert leaf.dtype == jnp.float32


def test_loss_and_grads(head):
    imgs = jnp.zeros((1, 1, 16, 16, 3))
    cond = jnp.ones((1, 1, 4, 32))
    uncond = jnp.zeros((1, 4, 32))
    valid = jnp.ones((1, 1), bool)

    def f(p):
        return sdxl_head_loss(p, CFG, imgs, cond, uncond, valid, jax.random.PRNGKey(1))[0]

    loss = f(head)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = jax.grad(f)(head)
    gp = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(g["global_projector"])))
    gu = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(g["unet"])))
    assert gp > 0 and gu > 0  # dual-conditioning path exercised


def test_precomputed_latents_path_matches_in_graph(head):
    """latents= (VAE encoder split into its own program — the 1024px
    graph-size lever) must reproduce the in-graph encode EXACTLY when fed
    the same r_lat draw, including gradients w.r.t. the conditioning."""
    from dreamllm_tpu.models.sd.sdxl import encode_latents

    imgs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 2, 16, 16, 3)),
                       jnp.float32)
    cond = jnp.ones((1, 2, 4, 32))
    uncond = jnp.zeros((1, 4, 32))
    valid = jnp.ones((1, 2), bool)
    rng = jax.random.PRNGKey(7)
    r_lat = jax.random.split(rng, 5)[0]  # the loss's own latent draw

    def f_in(c):
        return sdxl_head_loss(head, CFG, imgs, c, uncond, valid, rng)[0]

    lat = encode_latents(head, CFG, imgs, r_lat)
    assert lat.shape == (1, 2, 8, 8, 4)

    def f_pre(c):
        return sdxl_head_loss(head, CFG, imgs, c, uncond, valid, rng,
                              latents=lat)[0]

    l_in, g_in = jax.value_and_grad(f_in)(cond)
    l_pre, g_pre = jax.value_and_grad(f_pre)(cond)
    np.testing.assert_allclose(float(l_in), float(l_pre), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_in), np.asarray(g_pre), rtol=1e-5)


def test_latents_flow_through_train_step():
    """The 'latents' batch key reaches the head loss through
    make_train_step's extras whitelist (dreamllm_forward)."""
    seen = {}

    def spy_loss(head_params, images_dm, cond, uncond, valid, rng,
                 add_time_ids=None, latents=None, **_):
        seen["latents"] = latents
        return jnp.float32(0.0), {}

    from dreamllm_tpu.models.clip import CLIPVisionConfig
    from dreamllm_tpu.models.dreamllm import (
        DreamLLMConfig, dreamllm_forward, init_dreamllm_params,
    )
    from dreamllm_tpu.models.llama import LlamaConfig
    from dreamllm_tpu.models.projector import ProjectorConfig

    cfg = DreamLLMConfig(
        llm=LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=2, max_position_embeddings=32,
                        dtype=jnp.float32),
        vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=8, patch_size=4),
        vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
        n_dream_queries=4, image_embed_len=4,
    )
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
    params["sd_head"] = {"dummy": jnp.zeros(())}
    st = cfg.special_tokens
    ids = np.full((1, 16), 5, np.int32)
    ids[0, 3] = st.dream_start
    ids[0, 4:8] = st.im_patch
    ids[0, 8] = st.dream_end
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "images_dm": jnp.zeros((1, 1, 16, 16, 3)),
        "dream_positions": jnp.asarray([[4]], jnp.int32),
        "latents": jnp.ones((1, 1, 8, 8, 4)),
    }
    dreamllm_forward(params, cfg, batch, rng=jax.random.PRNGKey(1),
                     head_loss_fn=spy_loss, use_flash=False)
    assert seen["latents"] is not None
    assert seen["latents"].shape == (1, 1, 8, 8, 4)


@pytest.mark.parametrize("sampler", ["ddim", "dpm"])
def test_pipeline(head, sampler):
    cond = jnp.ones((1, 4, 32))
    uncond = jnp.zeros((1, 4, 32))
    img = sdxl_head_pipeline(
        head, CFG, cond, uncond, jax.random.PRNGKey(2),
        height=16, width=16, num_inference_steps=3, guidance_scale=4.0,
        sampler=sampler,
    )
    assert img.shape == (1, 16, 16, 3)
    a = np.asarray(img)
    assert np.all(np.isfinite(a)) and a.min() >= 0 and a.max() <= 1


def test_time_ids_change_output(head):
    """Micro-conditioning must reach the UNet."""
    imgs = jnp.zeros((1, 1, 16, 16, 3))
    cond = jnp.ones((1, 1, 4, 32))
    uncond = jnp.zeros((1, 4, 32))
    valid = jnp.ones((1, 1), bool)
    l1, _ = sdxl_head_loss(head, CFG, imgs, cond, uncond, valid, jax.random.PRNGKey(3),
                           add_time_ids=jnp.zeros((1, 1, 6)))
    l2, _ = sdxl_head_loss(head, CFG, imgs, cond, uncond, valid, jax.random.PRNGKey(3),
                           add_time_ids=jnp.full((1, 1, 6), 512.0))
    assert float(l1) != float(l2)


def test_interleaved_auto_dispatches_sdxl(head):
    """generate_interleaved picks sdxl_head_pipeline from the config type
    (sd_head_pipeline would drop the added_cond the SDXL UNet requires)."""
    from dreamllm_tpu.generation import InterleavedConfig, SamplingConfig, generate_interleaved
    from dreamllm_tpu.models.clip import CLIPVisionConfig
    from dreamllm_tpu.models.dreamllm import DreamLLMConfig, SpecialTokens, init_dreamllm_params
    from dreamllm_tpu.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_forward,
        llama_logits,
    )

    llm_cfg = LlamaConfig(
        vocab_size=40000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    llm_params = init_llama_params(jax.random.PRNGKey(0), llm_cfg)
    prompt = jnp.asarray([[5, 17, 300]])
    h = llama_forward(llm_params, llm_cfg, input_ids=prompt, use_flash=False)[
        "last_hidden_state"
    ]
    first = int(jnp.argmax(llama_logits(llm_params, llm_cfg, h[:, -1:])[:, 0], axis=-1)[0])
    assert first not in (0, 2)

    cfg = DreamLLMConfig(
        llm=llm_cfg,
        special_tokens=SpecialTokens(dream_start=first),
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

    out = generate_interleaved(
        params, cfg, head, CFG, prompt,
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
