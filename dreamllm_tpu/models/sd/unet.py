"""UNet2DConditionModel — NHWC, pure-functional JAX, SD 2.1 + SDXL configs.

TPU-native equivalent of the diffusers UNet the reference drives for both
training (modeling_plugins.py:544-557) and the CFG denoise loop (:806-839).
One generic implementation covers:

  * SD 2.1:  block_out_channels (320,640,1280,1280), 3×CrossAttnDownBlock2D +
    DownBlock2D, cross_attention_dim 1024, linear projections, 1 transformer
    layer per block.
  * SDXL:    block_out_channels (320,640,1280), DownBlock2D + 2×CrossAttn,
    transformer_layers_per_block (1,2,10), cross_attention_dim 2048, and the
    "text_time" addition embedding (add_time_ids + pooled text embeds,
    reference dreamllm_sdxl/modeling_plugins.py:196-215).

Attention inside transformer blocks uses ops.attention (XLA fused path; the
Pallas kernel engages for shapes it supports). All spatial tensors NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.models.sd.blocks import (
    conv2d,
    dense,
    downsample,
    init_conv,
    init_dense,
    init_norm,
    init_resnet_block,
    resnet_block,
    timestep_embedding,
    upsample,
)
from dreamllm_tpu.ops.activations import geglu
from dreamllm_tpu.ops.attention import flash_attention
from dreamllm_tpu.ops.norms import group_norm, layer_norm

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    transformer_layers_per_block: tuple[int, ...] = (1, 1, 1, 1)
    num_attention_heads: tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    # SDXL additions ("text_time"): temb += Linear(silu(Linear(cat(
    #   sinusoidal(add_time_ids), pooled_text))))
    addition_embed_type: str | None = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    dtype: Any = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def sdxl_unet_config(**kw) -> UNetConfig:
    defaults = dict(
        sample_size=128,
        block_out_channels=(320, 640, 1280),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
        transformer_layers_per_block=(1, 2, 10),
        num_attention_heads=(5, 10, 20),
        cross_attention_dim=2048,
        addition_embed_type="text_time",
    )
    defaults.update(kw)
    return UNetConfig(**defaults)


# ---------------------------------------------------------------------------
# Transformer2D (spatial transformer with cross attention)
# ---------------------------------------------------------------------------


def _init_tx_block(rng, c, ctx_dim, dtype):
    k = iter(jax.random.split(rng, 12))
    ff_inner = 4 * c
    return {
        "ln1": {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)},
        "attn1": {
            "q": init_dense(next(k), c, c, dtype),
            "k": init_dense(next(k), c, c, dtype),
            "v": init_dense(next(k), c, c, dtype),
            "out": init_dense(next(k), c, c, dtype),
        },
        "ln2": {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)},
        "attn2": {
            "q": init_dense(next(k), c, c, dtype),
            "k": init_dense(next(k), ctx_dim, c, dtype),
            "v": init_dense(next(k), ctx_dim, c, dtype),
            "out": init_dense(next(k), c, c, dtype),
        },
        "ln3": {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)},
        "ff_in": init_dense(next(k), c, 2 * ff_inner, dtype),  # geglu gate|up
        "ff_out": init_dense(next(k), ff_inner, c, dtype),
    }


def _init_transformer2d(rng, c, n_layers, ctx_dim, dtype):
    k = iter(jax.random.split(rng, n_layers + 3))
    return {
        "norm": init_norm(c, dtype),
        "proj_in": init_dense(next(k), c, c, dtype),  # linear (SD2.x/SDXL)
        "blocks": [_init_tx_block(next(k), c, ctx_dim, dtype) for _ in range(n_layers)],
        "proj_out": init_dense(next(k), c, c, dtype),
    }


def _mha(p, x, ctx, num_heads):
    b, s, c = x.shape
    hd = c // num_heads
    q = dense(x, p["q"]).reshape(b, s, num_heads, hd)
    k = dense(ctx, p["k"]).reshape(b, ctx.shape[1], num_heads, hd)
    v = dense(ctx, p["v"]).reshape(b, ctx.shape[1], num_heads, hd)
    # Pallas flash path (replaces the reference's xformers
    # memory_efficient_attention, modeling_plugins.py:397-398): the spatial
    # self-attention at 64x64 latents is seq 4096, where XLA's unfused
    # attention materializes the [B,H,S,S] scores in HBM. head_dim 64
    # lane-pads inside flash_attention; unsupported shapes (short cross-attn
    # kv) fall back to the fused-XLA path automatically.
    o = flash_attention(q, k, v, causal=False).reshape(b, s, c)
    return dense(o, p["out"])


def _tx_block(p, x, ctx, num_heads):
    y = layer_norm(x, p["ln1"]["w"], p["ln1"]["b"])
    x = x + _mha(p["attn1"], y, y, num_heads)
    x = x + _mha(p["attn2"], layer_norm(x, p["ln2"]["w"], p["ln2"]["b"]), ctx, num_heads)
    y = layer_norm(x, p["ln3"]["w"], p["ln3"]["b"])
    gate, up = jnp.split(dense(y, p["ff_in"]), 2, axis=-1)
    return x + dense(geglu(gate, up), p["ff_out"])


def _transformer2d(p, x, ctx, num_heads, groups):
    b, h, w, c = x.shape
    res = x
    y = group_norm(x, p["norm"]["w"], p["norm"]["b"], num_groups=groups)
    y = y.reshape(b, h * w, c)
    y = dense(y, p["proj_in"])
    for blk in p["blocks"]:
        y = _tx_block(blk, y, ctx, num_heads)
    y = dense(y, p["proj_out"])
    return res + y.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_unet_params(rng: jax.Array, cfg: UNetConfig) -> Params:
    d = cfg.dtype
    ch = cfg.block_out_channels
    ted = cfg.time_embed_dim
    keys = iter(jax.random.split(rng, 500))

    p: Params = {
        "time_embedding": {
            "linear_1": init_dense(next(keys), ch[0], ted, d),
            "linear_2": init_dense(next(keys), ted, ted, d),
        },
        "conv_in": init_conv(next(keys), 3, 3, cfg.in_channels, ch[0], d),
    }
    if cfg.addition_embed_type == "text_time":
        p["add_embedding"] = {
            "linear_1": init_dense(next(keys), cfg.projection_class_embeddings_input_dim, ted, d),
            "linear_2": init_dense(next(keys), ted, ted, d),
        }

    # down blocks
    down = []
    cin = ch[0]
    for i, btype in enumerate(cfg.down_block_types):
        cout = ch[i]
        blk: Params = {
            "resnets": [
                init_resnet_block(next(keys), cin if j == 0 else cout, cout, ted, d)
                for j in range(cfg.layers_per_block)
            ]
        }
        if btype == "CrossAttnDownBlock2D":
            blk["attentions"] = [
                _init_transformer2d(
                    next(keys), cout, cfg.transformer_layers_per_block[i],
                    cfg.cross_attention_dim, d,
                )
                for _ in range(cfg.layers_per_block)
            ]
        if i < len(ch) - 1:
            blk["downsample"] = init_conv(next(keys), 3, 3, cout, cout, d)
        down.append(blk)
        cin = cout
    p["down"] = down

    # mid
    c_mid = ch[-1]
    p["mid"] = {
        "resnet1": init_resnet_block(next(keys), c_mid, c_mid, ted, d),
        "attention": _init_transformer2d(
            next(keys), c_mid, cfg.transformer_layers_per_block[-1], cfg.cross_attention_dim, d
        ),
        "resnet2": init_resnet_block(next(keys), c_mid, c_mid, ted, d),
    }

    # up blocks (diffusers channel bookkeeping)
    up = []
    rev = list(reversed(ch))
    prev_out = rev[0]
    n = len(ch)
    for i, btype in enumerate(cfg.up_block_types):
        cout = rev[i]
        cin_skip_last = rev[min(i + 1, n - 1)]
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            skip_ch = cin_skip_last if j == cfg.layers_per_block else cout
            rin = prev_out if j == 0 else cout
            resnets.append(init_resnet_block(next(keys), rin + skip_ch, cout, ted, d))
        blk = {"resnets": resnets}
        if btype == "CrossAttnUpBlock2D":
            tl = tuple(reversed(cfg.transformer_layers_per_block))[i]
            blk["attentions"] = [
                _init_transformer2d(next(keys), cout, tl, cfg.cross_attention_dim, d)
                for _ in range(cfg.layers_per_block + 1)
            ]
        if i < n - 1:
            blk["upsample"] = init_conv(next(keys), 3, 3, cout, cout, d)
        up.append(blk)
        prev_out = cout
    p["up"] = up

    p["norm_out"] = init_norm(ch[0], d)
    p["conv_out"] = init_conv(next(keys), 3, 3, ch[0], cfg.out_channels, d, scale=1e-5)
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _unet_time_embedding(params, cfg, timesteps, added_cond, sample):
    """Shared time(+SDXL text_time) embedding for unet_forward and the
    DeepCache shallow path — one implementation so they cannot drift."""
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
    temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
    te = params["time_embedding"]
    temb = dense(jax.nn.silu(dense(temb.astype(sample.dtype), te["linear_1"])), te["linear_2"])
    if cfg.addition_embed_type == "text_time":
        assert added_cond is not None, "SDXL UNet needs added_cond time_ids/text_embeds"
        tids = added_cond["time_ids"]  # [B, 6]
        tid_emb = timestep_embedding(tids.reshape(-1), cfg.addition_time_embed_dim)
        tid_emb = tid_emb.reshape(tids.shape[0], -1)
        add = jnp.concatenate([added_cond["text_embeds"], tid_emb.astype(sample.dtype)], axis=-1)
        ae = params["add_embedding"]
        temb = temb + dense(jax.nn.silu(dense(add, ae["linear_1"])), ae["linear_2"])
    return temb


def unet_forward(
    params: Params,
    cfg: UNetConfig,
    sample: jnp.ndarray,                 # [B, H, W, in_ch] latents (NHWC)
    timesteps: jnp.ndarray,              # [B] or scalar
    encoder_hidden_states: jnp.ndarray,  # [B, S_ctx, cross_attention_dim]
    added_cond: dict | None = None,      # SDXL: {"time_ids": [B,6], "text_embeds": [B,1280]}
    return_deep: bool = False,           # also return the input to the last up block
    down_block_residuals: tuple | None = None,  # ControlNet skip residuals
    mid_block_residual: jnp.ndarray | None = None,  # ControlNet mid residual
    remat: bool = False,                 # checkpoint per down/mid/up block:
                                         # backward keeps only block-boundary
                                         # activations (the 1024px SDXL
                                         # training capacity knob)
) -> jnp.ndarray:
    g = cfg.norm_num_groups
    heads = cfg.num_attention_heads
    temb = _unet_time_embedding(params, cfg, timesteps, added_cond, sample)
    ctx = encoder_hidden_states.astype(sample.dtype)

    def ckpt(f):
        return jax.checkpoint(f) if remat else f

    h = conv2d(sample, params["conv_in"])
    skips = [h]
    for i, blk in enumerate(params["down"]):
        def down_blk(blk, h, temb, ctx, _i=i):
            outs = []
            for j, r in enumerate(blk["resnets"]):
                h = resnet_block(r, h, temb, groups=g, eps=1e-5)
                if "attentions" in blk:
                    h = _transformer2d(blk["attentions"][j], h, ctx, heads[_i], g)
                outs.append(h)
            if "downsample" in blk:
                h = downsample(blk["downsample"], h, symmetric=True)
                outs.append(h)
            return h, outs

        h, outs = ckpt(down_blk)(blk, h, temb, ctx)
        skips.extend(outs)

    if down_block_residuals is not None:
        # ControlNet conditioning (diffusers down_block_additional_residuals
        # semantics): one residual per collected skip, added before the up
        # blocks consume them (models/sd/controlnet.py)
        assert len(down_block_residuals) == len(skips), (
            len(down_block_residuals), len(skips))
        skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_block_residuals)]

    def mid_blk(m, h, temb, ctx):
        h = resnet_block(m["resnet1"], h, temb, groups=g, eps=1e-5)
        h = _transformer2d(m["attention"], h, ctx, heads[-1], g)
        return resnet_block(m["resnet2"], h, temb, groups=g, eps=1e-5)

    h = ckpt(mid_blk)(params["mid"], h, temb, ctx)
    if mid_block_residual is not None:
        h = h + mid_block_residual.astype(h.dtype)

    rev_heads = list(reversed(heads))
    deep = None
    for i, blk in enumerate(params["up"]):
        if i == len(params["up"]) - 1:
            deep = h  # feature entering the last (shallowest) up block

        def up_blk(blk, h, blk_skips, temb, ctx, _i=i):
            for j, r in enumerate(blk["resnets"]):
                h = jnp.concatenate([h, blk_skips[-(j + 1)]], axis=-1)
                h = resnet_block(r, h, temb, groups=g, eps=1e-5)
                if "attentions" in blk:
                    h = _transformer2d(blk["attentions"][j], h, ctx, rev_heads[_i], g)
            if "upsample" in blk:
                h = upsample(blk["upsample"], h)
            return h

        n_res = len(blk["resnets"])
        take, skips = skips[-n_res:], skips[:-n_res]
        h = ckpt(up_blk)(blk, h, take, temb, ctx)

    h = group_norm(h, params["norm_out"]["w"], params["norm_out"]["b"], num_groups=g, eps=1e-5)
    h = jax.nn.silu(h)
    out = conv2d(h, params["conv_out"])
    if return_deep:
        return out, deep
    return out


def unet_forward_shallow(
    params: Params,
    cfg: UNetConfig,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    deep_feature: jnp.ndarray,           # cached input to the last up block
    added_cond: dict | None = None,
) -> jnp.ndarray:
    """DeepCache-style cached step ("Cache Me if You Can" / DeepCache,
    PAPERS.md): deep blocks change slowly across adjacent denoise steps, so a
    cached step recomputes ONLY the shallowest down block (for fresh skips)
    and the last up block, splicing in the cached deep feature — skipping
    ~75-85% of the UNet's FLOPs. Pair with ``unet_forward(return_deep=True)``
    on refresh steps. Opt-in; off by default in the pipeline."""
    g = cfg.norm_num_groups
    heads = cfg.num_attention_heads
    temb = _unet_time_embedding(params, cfg, timesteps, added_cond, sample)
    ctx = encoder_hidden_states.astype(sample.dtype)
    h = conv2d(sample, params["conv_in"])
    skips = [h]
    blk0 = params["down"][0]
    for j, r in enumerate(blk0["resnets"]):
        h = resnet_block(r, h, temb, groups=g, eps=1e-5)
        if "attentions" in blk0:
            h = _transformer2d(blk0["attentions"][j], h, ctx, heads[0], g)
        skips.append(h)

    # last up block consumes the cached deep feature + the fresh shallow skips
    blk = params["up"][-1]
    rev_heads = list(reversed(heads))
    h = deep_feature
    for j, r in enumerate(blk["resnets"]):
        skip = skips.pop()
        h = jnp.concatenate([h, skip], axis=-1)
        h = resnet_block(r, h, temb, groups=g, eps=1e-5)
        if "attentions" in blk:
            h = _transformer2d(blk["attentions"][j], h, ctx, rev_heads[-1], g)

    h = group_norm(h, params["norm_out"]["w"], params["norm_out"]["b"], num_groups=g, eps=1e-5)
    h = jax.nn.silu(h)
    return conv2d(h, params["conv_out"])
