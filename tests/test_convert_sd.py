"""Round-trip tests for the diffusers-layout SD converters: our params →
export (diffusers names) → convert → identical pytree, for both VAE and UNet
(incl. SDXL add_embedding)."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.convert.hf_sd import (
    convert_unet_state_dict,
    convert_vae_state_dict,
    export_unet_state_dict,
    export_vae_state_dict,
)
from dreamllm_tpu.models.sd import UNetConfig, VAEConfig, init_unet_params, init_vae_params
from dreamllm_tpu.models.sd.unet import sdxl_unet_config

TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
TINY_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 4),
    cross_attention_dim=24,
    norm_num_groups=4,
)


def assert_trees_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7)


def test_vae_roundtrip():
    params = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
    sd = export_vae_state_dict(params)
    # spot-check diffusers naming conventions exist
    assert "encoder.down_blocks.0.resnets.0.conv1.weight" in sd
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in sd
    assert "quant_conv.weight" in sd
    back = convert_vae_state_dict(sd, TINY_VAE)
    assert_trees_equal(params, back)


def test_unet_roundtrip():
    params = init_unet_params(jax.random.PRNGKey(1), TINY_UNET)
    sd = export_unet_state_dict(params)
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight" in sd
    assert "mid_block.attentions.0.proj_in.weight" in sd
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in sd
    back = convert_unet_state_dict(sd, TINY_UNET)
    assert_trees_equal(params, back)
    # torch conv layout sanity: exported conv is [out, in, kh, kw]
    w = sd["conv_in.weight"]
    assert w.shape == (16, 4, 3, 3)


def test_sdxl_unet_roundtrip():
    cfg = sdxl_unet_config(
        sample_size=8,
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        transformer_layers_per_block=(1, 2),
        num_attention_heads=(2, 4),
        cross_attention_dim=24,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=64,
        norm_num_groups=4,
        layers_per_block=1,
    )
    params = init_unet_params(jax.random.PRNGKey(2), cfg)
    sd = export_unet_state_dict(params)
    assert "add_embedding.linear_1.weight" in sd
    # 2 transformer layers in the deepest cross-attn block
    assert "down_blocks.1.attentions.0.transformer_blocks.1.attn1.to_q.weight" in sd
    back = convert_unet_state_dict(sd, cfg)
    assert_trees_equal(params, back)
