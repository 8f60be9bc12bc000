"""Projectors bridging vision features ↔ LLM embedding space.

TPU-native equivalents of `omni/models/projector/` (builder.py:9-22,
mlp_projector.py:11-50, conv_projector.py:11-43, sam_projector.py:9-43):

  * ``linear`` — single Linear (depth=1).
  * ``mlp``    — Linear-GELU-…-Linear (depth≥2).
  * ``conv``   — 3×3 conv over the √S×√S patch grid then linear.
  * ``sam``    — two stride-2 3×3 convs (downsamples 4×) then linear.

All are pure functions over param pytrees; weights [in, out], convs HWIO over
NHWC. The reference's list-in/list-out forward (base_projector.py:8-36) is
dropped — vmap/tree ops cover multi-input cases.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    projector_type: str = "linear"  # linear | mlp | conv | sam
    in_dim: int = 1024
    out_dim: int = 4096
    depth: int = 1
    hidden_dim: int | None = None  # mlp middle width; defaults to out_dim
    dtype: Any = jnp.float32


def init_projector_params(rng: jax.Array, cfg: ProjectorConfig) -> Params:
    d = cfg.dtype
    keys = jax.random.split(rng, max(cfg.depth, 3))

    def dense(key, din, dout):
        w = jax.random.normal(key, (din, dout), jnp.float32) * din**-0.5
        return {"w": w.astype(d), "b": jnp.zeros((dout,), d)}

    def conv(key, cin, cout):
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * (9 * cin) ** -0.5
        return {"w": w.astype(d), "b": jnp.zeros((cout,), d)}

    t = cfg.projector_type
    if t == "linear":
        return {"layers": [dense(keys[0], cfg.in_dim, cfg.out_dim)]}
    if t == "mlp":
        hid = cfg.hidden_dim or cfg.out_dim
        dims = [cfg.in_dim] + [hid] * (cfg.depth - 1) + [cfg.out_dim]
        return {"layers": [dense(k, a, b) for k, a, b in zip(keys, dims[:-1], dims[1:])]}
    if t == "conv":
        return {"conv": conv(keys[0], cfg.in_dim, cfg.in_dim),
                "proj": dense(keys[1], cfg.in_dim, cfg.out_dim)}
    if t == "sam":
        return {
            "conv1": conv(keys[0], cfg.in_dim, cfg.in_dim),
            "conv2": conv(keys[1], cfg.in_dim, cfg.in_dim),
            "proj": dense(keys[2], cfg.in_dim, cfg.out_dim),
        }
    raise ValueError(f"unknown projector_type {t!r}")


def _conv2d(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def projector_forward(params: Params, cfg: ProjectorConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Project ``[B, S, in_dim]`` token features to ``[B, S', out_dim]``.

    conv/sam reshape S to a square grid (S must be a perfect square); sam
    reduces S by 16× (two stride-2 convs), conv preserves S.
    """
    t = cfg.projector_type
    if t in ("linear", "mlp"):
        for i, layer in enumerate(params["layers"]):
            x = x @ layer["w"].astype(x.dtype) + layer["b"].astype(x.dtype)
            if i + 1 < len(params["layers"]):
                x = jax.nn.gelu(x, approximate=False)  # exact erf (torch nn.GELU)
        return x

    b, s, c = x.shape
    g = int(math.isqrt(s))
    assert g * g == s, f"conv projectors need square token grids, got {s}"
    grid = x.reshape(b, g, g, c)
    if t == "conv":
        grid = jax.nn.gelu(_conv2d(grid, params["conv"], stride=1), approximate=False)
    elif t == "sam":
        grid = jax.nn.gelu(_conv2d(grid, params["conv1"], stride=2), approximate=False)
        grid = jax.nn.gelu(_conv2d(grid, params["conv2"], stride=2), approximate=False)
    else:
        raise ValueError(t)
    y = grid.reshape(b, -1, c)
    p = params["proj"]
    return y @ p["w"].astype(y.dtype) + p["b"].astype(y.dtype)


def projector_out_len(cfg: ProjectorConfig, in_len: int) -> int:
    """Static output sequence length for a given input length."""
    if cfg.projector_type == "sam":
        g = int(math.isqrt(in_len))
        return ((g + 1) // 2 + 1) // 2 * (((g + 1) // 2 + 1) // 2)
    return in_len
