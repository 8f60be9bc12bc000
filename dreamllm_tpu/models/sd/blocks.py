"""Shared conv/attention building blocks for the SD VAE and UNet (NHWC).

TPU-native equivalents of diffusers' ResnetBlock2D / Attention /
Downsample2D / Upsample2D used by the reference's AutoencoderKL and
UNet2DConditionModel (modeling_plugins.py:375-381). Layout is NHWC with HWIO
conv weights so XLA maps convs onto the MXU without transposes; GroupNorm
statistics are fp32 (ops/norms.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.ops.norms import group_norm
from dreamllm_tpu.ops.attention import dot_product_attention

Params = dict[str, Any]


def init_conv(rng, kh, kw, cin, cout, dtype=jnp.float32, scale=None):
    fan_in = kh * kw * cin
    scale = scale if scale is not None else fan_in**-0.5
    w = jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * scale
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def init_dense(rng, din, dout, dtype=jnp.float32, scale=None):
    scale = scale if scale is not None else din**-0.5
    w = jax.random.normal(rng, (din, dout), jnp.float32) * scale
    return {"w": w.astype(dtype), "b": jnp.zeros((dout,), dtype)}


def init_norm(c, dtype=jnp.float32):
    return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def conv2d(x, p, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def dense(x, p):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# ResNet block (diffusers ResnetBlock2D)
# ---------------------------------------------------------------------------


def init_resnet_block(rng, cin, cout, temb_dim=None, dtype=jnp.float32):
    k = jax.random.split(rng, 4)
    p = {
        "norm1": init_norm(cin, dtype),
        "conv1": init_conv(k[0], 3, 3, cin, cout, dtype),
        "norm2": init_norm(cout, dtype),
        "conv2": init_conv(k[1], 3, 3, cout, cout, dtype),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = init_dense(k[2], temb_dim, cout, dtype)
    if cin != cout:
        p["shortcut"] = init_conv(k[3], 1, 1, cin, cout, dtype)
    return p


def resnet_block(p: Params, x: jnp.ndarray, temb: jnp.ndarray | None = None, groups: int = 32,
                 eps: float = 1e-6):
    """norm→silu→conv→(+temb)→norm→silu→conv + shortcut."""
    h = group_norm(x, p["norm1"]["w"], p["norm1"]["b"], num_groups=groups, eps=eps)
    h = jax.nn.silu(h)
    h = conv2d(h, p["conv1"])
    if temb is not None and "time_emb_proj" in p:
        t = dense(jax.nn.silu(temb), p["time_emb_proj"])
        h = h + t[:, None, None, :].astype(h.dtype)
    h = group_norm(h, p["norm2"]["w"], p["norm2"]["b"], num_groups=groups, eps=eps)
    h = jax.nn.silu(h)
    h = conv2d(h, p["conv2"])
    if "shortcut" in p:
        x = conv2d(x, p["shortcut"])
    return x + h


# ---------------------------------------------------------------------------
# Spatial self-attention block (diffusers Attention used in VAE mid / UNet mid)
# ---------------------------------------------------------------------------


def init_attn_block(rng, c, dtype=jnp.float32):
    k = jax.random.split(rng, 4)
    return {
        "norm": init_norm(c, dtype),
        "q": init_dense(k[0], c, c, dtype),
        "k": init_dense(k[1], c, c, dtype),
        "v": init_dense(k[2], c, c, dtype),
        "out": init_dense(k[3], c, c, dtype),
    }


def attn_block(p: Params, x: jnp.ndarray, num_heads: int = 1, groups: int = 32):
    b, h, w, c = x.shape
    y = group_norm(x, p["norm"]["w"], p["norm"]["b"], num_groups=groups)
    y = y.reshape(b, h * w, c)
    hd = c // num_heads
    q = dense(y, p["q"]).reshape(b, h * w, num_heads, hd)
    k = dense(y, p["k"]).reshape(b, h * w, num_heads, hd)
    v = dense(y, p["v"]).reshape(b, h * w, num_heads, hd)
    a = dot_product_attention(q, k, v, causal=False).reshape(b, h * w, c)
    return x + dense(a, p["out"]).reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Resampling (diffusers Downsample2D / Upsample2D)
# ---------------------------------------------------------------------------


def downsample(p: Params, x: jnp.ndarray, *, symmetric: bool = False):
    """stride-2 conv. diffusers uses two padding conventions and they are NOT
    numerically equivalent: the VAE encoder pads asymmetrically (0,1) per
    spatial dim (Downsample2D(padding=0) + F.pad), while the UNet pads
    symmetrically 1 (Downsample2D(padding=1) → Conv2d(stride=2, padding=1)).
    Round-1 shipped asymmetric for both; the torch-parity suite
    (tests/test_sd_torch_parity.py) caught the UNet deviation."""
    if symmetric:
        return conv2d(x, p, stride=2, padding=((1, 1), (1, 1)))
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(x, p, stride=2, padding="VALID")


def upsample(p: Params, x: jnp.ndarray):
    """nearest 2× then 3×3 conv."""
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
    return conv2d(x, p)


# ---------------------------------------------------------------------------
# Timestep embedding (diffusers get_timestep_embedding, SD settings)
# ---------------------------------------------------------------------------


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, flip_sin_to_cos=True, downscale_freq_shift=0
    → layout [cos | sin]. t: [B] int/float → [B, dim] fp32."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
