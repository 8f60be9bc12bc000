"""ControlNet head (models/sd/controlnet.py) — the reference's
controlnet_pipeline counterpart (modeling_dreamllm.py:1891-2041; the
reference's own ControlNetHead class ships disabled,
modeling_plugins.py:853-1474).

Pinned invariants:
  * zero-init no-op — a fresh ControlNet's residuals leave the UNet output
    EXACTLY unchanged (the property that makes ControlNet training stable);
  * the control image influences the output once the zero convs are live;
  * diffusers-layout state-dict round-trip (export -> convert == identity);
  * the full controlnet_pipeline runs end-to-end on a tiny config.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-suite only; fast tier: -m 'not slow'

from dreamllm_tpu.models.sd import UNetConfig, VAEConfig, init_unet_params, unet_forward
from dreamllm_tpu.models.sd.controlnet import (
    ControlNetConfig,
    controlnet_forward,
    init_controlnet_params,
    n_skip_residuals,
)

UCFG = UNetConfig(
    sample_size=8, block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 4), cross_attention_dim=48, norm_num_groups=8,
)
CCFG = ControlNetConfig(unet=UCFG, conditioning_embedding_out_channels=(8, 16))


@pytest.fixture(scope="module")
def setup():
    unet = init_unet_params(jax.random.PRNGKey(0), UCFG)
    cnet = init_controlnet_params(jax.random.PRNGKey(1), CCFG)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 6, 48)), jnp.float32)
    # one stride-2 embedder block (ladder (8, 16)) -> pixel res = 2x latent
    cond = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
    t = jnp.asarray([500, 500])
    return unet, cnet, lat, ctx, cond, t


def test_residual_count_matches_unet_skips(setup):
    unet, cnet, lat, ctx, cond, t = setup
    down, mid = controlnet_forward(cnet, CCFG, lat, t, ctx, cond)
    assert len(down) == n_skip_residuals(UCFG) == len(cnet["zero_convs"])
    assert mid.shape == (2, 4, 4, 64)  # downsampled once, mid channels


def test_zero_init_is_exact_noop(setup):
    unet, cnet, lat, ctx, cond, t = setup
    base = unet_forward(unet, UCFG, lat, t, ctx)
    down, mid = controlnet_forward(cnet, CCFG, lat, t, ctx, cond)
    # fresh zero convs -> all residuals are exactly zero
    assert all(float(jnp.abs(r).max()) == 0.0 for r in down)
    assert float(jnp.abs(mid).max()) == 0.0
    out = unet_forward(unet, UCFG, lat, t, ctx,
                       down_block_residuals=down, mid_block_residual=mid)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def _live(cnet):
    """Give the zero convs real weights so conditioning flows."""
    live = jax.tree.map(lambda x: x, cnet)  # copy
    k = iter(jax.random.split(jax.random.PRNGKey(7), 64))
    live["zero_convs"] = [
        {"w": jax.random.normal(next(k), z["w"].shape) * 0.1, "b": z["b"]}
        for z in cnet["zero_convs"]
    ]
    live["mid_zero_conv"] = {
        "w": jax.random.normal(next(k), cnet["mid_zero_conv"]["w"].shape) * 0.1,
        "b": cnet["mid_zero_conv"]["b"],
    }
    emb = dict(live["cond_embedding"])
    emb["conv_out"] = {
        "w": jax.random.normal(next(k), emb["conv_out"]["w"].shape) * 0.1,
        "b": emb["conv_out"]["b"],
    }
    live["cond_embedding"] = emb
    return live


def test_conditioning_image_changes_output(setup):
    unet, cnet, lat, ctx, cond, t = setup
    live = _live(cnet)
    base = unet_forward(unet, UCFG, lat, t, ctx)

    def run(img, scale=1.0):
        down, mid = controlnet_forward(
            live, CCFG, lat, t, ctx, img, conditioning_scale=scale)
        return unet_forward(unet, UCFG, lat, t, ctx,
                            down_block_residuals=down, mid_block_residual=mid)

    out_a = run(cond)
    out_b = run(jnp.roll(cond, 7, axis=1))
    assert float(jnp.abs(out_a - np.asarray(base)).max()) > 1e-6
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6  # image matters
    # conditioning_scale=0 restores the base output exactly
    out_zero = run(cond, scale=0.0)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(base),
                               atol=1e-6)


def test_state_dict_round_trip(setup):
    from dreamllm_tpu.convert.hf_sd import (
        convert_controlnet_state_dict,
        export_controlnet_state_dict,
    )

    _, cnet, *_ = setup
    sd = export_controlnet_state_dict(cnet)
    back = convert_controlnet_state_dict(sd, CCFG, dtype=jnp.float32)
    flat_a, tdef_a = jax.tree_util.tree_flatten_with_path(cnet)
    flat_b, tdef_b = jax.tree_util.tree_flatten_with_path(back)
    assert tdef_a == tdef_b
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-6, err_msg=jax.tree_util.keystr(path),
        )


def test_controlnet_pipeline_end_to_end():
    from dreamllm_tpu.models.projector import ProjectorConfig
    from dreamllm_tpu.models.sd.head import (
        SDHeadConfig, controlnet_pipeline, init_sd_head_params,
    )

    head_cfg = SDHeadConfig(
        unet=UCFG,
        vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                      norm_num_groups=8),
        llm_hidden_size=32,
        projector=ProjectorConfig(projector_type="linear", in_dim=32, out_dim=48),
    )
    params = init_sd_head_params(jax.random.PRNGKey(0), head_cfg)
    cnet = _live(init_controlnet_params(jax.random.PRNGKey(1), CCFG))
    rng = np.random.default_rng(1)
    cond_e = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    uncond_e = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    # control image at pixel res matching the VAE factor (2 levels -> /2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    out = controlnet_pipeline(
        params, head_cfg, cnet, CCFG, img, cond_e, uncond_e,
        jax.random.PRNGKey(2), num_inference_steps=3, guidance_scale=2.0,
    )
    assert out.shape == (1, 16, 16, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and 0.0 <= o.min() and o.max() <= 1.0
    # the control image steers generation
    out2 = controlnet_pipeline(
        params, head_cfg, cnet, CCFG, jnp.roll(img, 5, axis=1), cond_e,
        uncond_e, jax.random.PRNGKey(2), num_inference_steps=3,
        guidance_scale=2.0,
    )
    assert float(jnp.abs(out - out2).max()) > 1e-6
