"""ControlNet — spatially-conditioned diffusion control (Zhang et al. 2023).

TPU-native counterpart of the ONE reference API surface round 2 left
uncovered: ``controlnet_pipeline`` (modeling_dreamllm.py:1891-2041) drives a
diffusers ControlNetModel whose in-repo head class is disabled
(modeling_plugins.py:853-1474, commented out). Here the head is live:

  * a trainable copy of the UNet ENCODER (conv_in + down blocks + mid) —
    parameter layout identical to the matching ``init_unet_params`` subtrees
    so SD encoder weights copy straight in;
  * a conditioning embedder mapping the control image (canny/depth/pose,
    pixel space, NHWC in [0, 1]) down to latent resolution;
  * zero-initialized 1x1 projections per skip + mid ("zero convs") so a
    freshly-initialized ControlNet is an exact no-op on the UNet output —
    the property that makes ControlNet finetuning stable, and the invariant
    tests/test_controlnet.py pins.

``unet_forward(..., down_block_residuals=..., mid_block_residual=...)``
consumes the residuals exactly like diffusers' UNet consumes
``down_block_additional_residuals`` / ``mid_block_additional_residual``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.models.sd.blocks import (
    conv2d,
    downsample,
    init_conv,
    resnet_block,
)
from dreamllm_tpu.models.sd.unet import (
    UNetConfig,
    _transformer2d,
    _unet_time_embedding,
    init_unet_params,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    conditioning_channels: int = 3
    # channel ladder of the conditioning embedder (diffusers default)
    conditioning_embedding_out_channels: tuple[int, ...] = (16, 32, 96, 256)


def n_skip_residuals(cfg: UNetConfig) -> int:
    """conv_in + per down block: layers_per_block resnets (+ a downsample on
    all but the last block) — must equal the skip count unet_forward stacks."""
    n = 1
    for i in range(len(cfg.down_block_types)):
        n += cfg.layers_per_block
        if i < len(cfg.block_out_channels) - 1:
            n += 1
    return n


def init_controlnet_params(rng: jax.Array, cfg: ControlNetConfig) -> Params:
    u = cfg.unet
    d = u.dtype
    r_unet, r_cond, r_zero = jax.random.split(rng, 3)
    full = init_unet_params(r_unet, u)
    p: Params = {k: full[k] for k in ("time_embedding", "conv_in", "down", "mid")}
    if "add_embedding" in full:
        p["add_embedding"] = full["add_embedding"]

    # conditioning embedder: conv3x3 -> [conv3x3, conv3x3 stride2]* -> zero conv3x3
    ch = cfg.conditioning_embedding_out_channels
    keys = iter(jax.random.split(r_cond, 2 * len(ch) + 2))
    emb: Params = {"conv_in": init_conv(next(keys), 3, 3, cfg.conditioning_channels, ch[0], d)}
    blocks = []
    for i in range(len(ch) - 1):
        blocks.append({
            "conv1": init_conv(next(keys), 3, 3, ch[i], ch[i], d),
            "conv2": init_conv(next(keys), 3, 3, ch[i], ch[i + 1], d),  # stride 2
        })
    emb["blocks"] = blocks
    emb["conv_out"] = init_conv(next(keys), 3, 3, ch[-1], u.block_out_channels[0], d, scale=0.0)
    p["cond_embedding"] = emb

    # zero convs: one 1x1 per skip + one for mid (all zero-init -> no-op)
    skip_ch = [u.block_out_channels[0]]
    for i in range(len(u.down_block_types)):
        skip_ch += [u.block_out_channels[i]] * u.layers_per_block
        if i < len(u.block_out_channels) - 1:
            skip_ch.append(u.block_out_channels[i])
    assert len(skip_ch) == n_skip_residuals(u)
    zkeys = iter(jax.random.split(r_zero, len(skip_ch) + 1))
    p["zero_convs"] = [
        init_conv(next(zkeys), 1, 1, c, c, d, scale=0.0) for c in skip_ch
    ]
    p["mid_zero_conv"] = init_conv(
        next(zkeys), 1, 1, u.block_out_channels[-1], u.block_out_channels[-1], d, scale=0.0
    )
    return p


def controlnet_cond_embed(params: Params, cond_image: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] pixel-space control image -> [B, H/8, W/8, ch0] feature
    (diffusers ControlNetConditioningEmbedding)."""
    h = jax.nn.silu(conv2d(cond_image, params["conv_in"]))
    for blk in params["blocks"]:
        h = jax.nn.silu(conv2d(h, blk["conv1"]))
        h = jax.nn.silu(conv2d(h, blk["conv2"], stride=2))
    return conv2d(h, params["conv_out"])


def controlnet_forward(
    params: Params,
    cfg: ControlNetConfig,
    sample: jnp.ndarray,                 # [B, h, w, in_ch] latents (NHWC)
    timesteps: jnp.ndarray,              # [B] or scalar
    encoder_hidden_states: jnp.ndarray,  # [B, S_ctx, cross_attention_dim]
    cond_image: jnp.ndarray,             # [B, 8h, 8w, cond_ch] in [0, 1]
    conditioning_scale: float = 1.0,
    added_cond: dict | None = None,
):
    """Returns ``(down_residuals: tuple, mid_residual)`` to feed into
    ``unet_forward``; mirrors diffusers ControlNetModel.forward."""
    u = cfg.unet
    g = u.norm_num_groups
    heads = u.num_attention_heads
    temb = _unet_time_embedding(params, u, timesteps, added_cond, sample)
    ctx = encoder_hidden_states.astype(sample.dtype)

    h = conv2d(sample, params["conv_in"])
    h = h + controlnet_cond_embed(params["cond_embedding"], cond_image.astype(h.dtype))
    skips = [h]
    for i, blk in enumerate(params["down"]):
        for j, r in enumerate(blk["resnets"]):
            h = resnet_block(r, h, temb, groups=g, eps=1e-5)
            if "attentions" in blk:
                h = _transformer2d(blk["attentions"][j], h, ctx, heads[i], g)
            skips.append(h)
        if "downsample" in blk:
            h = downsample(blk["downsample"], h, symmetric=True)
            skips.append(h)

    m = params["mid"]
    h = resnet_block(m["resnet1"], h, temb, groups=g, eps=1e-5)
    h = _transformer2d(m["attention"], h, ctx, heads[-1], g)
    h = resnet_block(m["resnet2"], h, temb, groups=g, eps=1e-5)

    down_res = tuple(
        conv2d(s, z) * conditioning_scale
        for s, z in zip(skips, params["zero_convs"])
    )
    mid_res = conv2d(h, params["mid_zero_conv"]) * conditioning_scale
    return down_res, mid_res
