"""AutoencoderKL (SD VAE) — NHWC, pure-functional JAX.

TPU-native equivalent of the diffusers AutoencoderKL the reference loads
(modeling_plugins.py:375-378). Architecture (SD 1.x/2.x default):

  encoder: conv_in → 4 DownEncoderBlocks (2 resnets each, stride-2 conv
  downsample between) → mid (resnet, self-attn, resnet) → GN/silu →
  conv_out (2·latent ch) → quant_conv 1×1 → (mean, logvar)

  decoder: post_quant_conv 1×1 → conv_in → mid → 4 UpDecoderBlocks
  (3 resnets each, nearest-2×+conv upsample between) → GN/silu → conv_out

The fp32-VAE policy (SDXL keeps the VAE in fp32 while the UNet runs bf16,
reference dreamllm_sdxl/modeling_plugins.py:140-149) is a dtype choice on the
params — pass dtype=jnp.float32 at init and cast activations at the head.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.models.sd.blocks import (
    attn_block,
    conv2d,
    downsample,
    init_attn_block,
    init_conv,
    init_norm,
    init_resnet_block,
    resnet_block,
    upsample,
)
from dreamllm_tpu.ops.norms import group_norm

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: Any = jnp.float32


def init_vae_params(rng: jax.Array, cfg: VAEConfig) -> Params:
    d = cfg.dtype
    ch = cfg.block_out_channels
    keys = iter(jax.random.split(rng, 200))

    # ----- encoder -----
    enc: Params = {"conv_in": init_conv(next(keys), 3, 3, cfg.in_channels, ch[0], d)}
    down = []
    cin = ch[0]
    for i, cout in enumerate(ch):
        block = {
            "resnets": [
                init_resnet_block(next(keys), cin if j == 0 else cout, cout, None, d)
                for j in range(cfg.layers_per_block)
            ]
        }
        if i < len(ch) - 1:
            block["downsample"] = init_conv(next(keys), 3, 3, cout, cout, d)
        down.append(block)
        cin = cout
    enc["down"] = down
    c_mid = ch[-1]
    enc["mid"] = {
        "resnet1": init_resnet_block(next(keys), c_mid, c_mid, None, d),
        "attn": init_attn_block(next(keys), c_mid, d),
        "resnet2": init_resnet_block(next(keys), c_mid, c_mid, None, d),
    }
    enc["norm_out"] = init_norm(c_mid, d)
    enc["conv_out"] = init_conv(next(keys), 3, 3, c_mid, 2 * cfg.latent_channels, d)

    # ----- decoder -----
    dec: Params = {"conv_in": init_conv(next(keys), 3, 3, cfg.latent_channels, ch[-1], d)}
    dec["mid"] = {
        "resnet1": init_resnet_block(next(keys), c_mid, c_mid, None, d),
        "attn": init_attn_block(next(keys), c_mid, d),
        "resnet2": init_resnet_block(next(keys), c_mid, c_mid, None, d),
    }
    up = []
    rev = list(reversed(ch))
    cin = rev[0]
    for i, cout in enumerate(rev):
        block = {
            "resnets": [
                init_resnet_block(next(keys), cin if j == 0 else cout, cout, None, d)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if i < len(rev) - 1:
            block["upsample"] = init_conv(next(keys), 3, 3, cout, cout, d)
        up.append(block)
        cin = cout
    dec["up"] = up
    dec["norm_out"] = init_norm(ch[0], d)
    dec["conv_out"] = init_conv(next(keys), 3, 3, ch[0], cfg.out_channels, d)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": init_conv(next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels, d),
        "post_quant_conv": init_conv(next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels, d),
    }


def vae_encode(params: Params, cfg: VAEConfig, x: jnp.ndarray):
    """Image [B,H,W,3] in [-1,1] → (mean, logvar) each [B,H/8,W/8,latent]."""
    g = cfg.norm_num_groups
    e = params["encoder"]
    h = conv2d(x, e["conv_in"])
    for block in e["down"]:
        for r in block["resnets"]:
            h = resnet_block(r, h, groups=g)
        if "downsample" in block:
            h = downsample(block["downsample"], h)
    m = e["mid"]
    h = resnet_block(m["resnet1"], h, groups=g)
    h = attn_block(m["attn"], h, groups=g)
    h = resnet_block(m["resnet2"], h, groups=g)
    h = group_norm(h, e["norm_out"]["w"], e["norm_out"]["b"], num_groups=g)
    h = jax.nn.silu(h)
    h = conv2d(h, e["conv_out"])
    h = conv2d(h, params["quant_conv"])
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_sample(mean: jnp.ndarray, logvar: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """DiagonalGaussianDistribution.sample()."""
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)


def vae_decode(params: Params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Latent [B,h,w,latent] (already ÷ scaling_factor) → image [B,8h,8w,3]."""
    g = cfg.norm_num_groups
    d = params["decoder"]
    h = conv2d(z, params["post_quant_conv"])
    h = conv2d(h, d["conv_in"])
    m = d["mid"]
    h = resnet_block(m["resnet1"], h, groups=g)
    h = attn_block(m["attn"], h, groups=g)
    h = resnet_block(m["resnet2"], h, groups=g)
    for block in d["up"]:
        for r in block["resnets"]:
            h = resnet_block(r, h, groups=g)
        if "upsample" in block:
            h = upsample(block["upsample"], h)
    h = group_norm(h, d["norm_out"]["w"], d["norm_out"]["b"], num_groups=g)
    h = jax.nn.silu(h)
    return conv2d(h, d["conv_out"])
