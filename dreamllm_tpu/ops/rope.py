"""Rotary position embeddings with linear / dynamic-NTK scaling.

TPU-native equivalent of the reference's rotary classes
(modeling_dreamllm.py:97-184: RotaryEmbedding, LinearScalingRotaryEmbedding,
DynamicNTKScalingRotaryEmbedding, apply_rotary_pos_emb).

Design: instead of a stateful nn.Module with a cached cos/sin buffer, the
table is a pure function of (config, positions). Under jit the table for a
static max length is a constant folded at compile time; during decode we
gather rows by position ids, keeping shapes static.

Layout convention: q/k are ``[batch, seq, num_heads, head_dim]`` and rotation
is the "rotate-half" form used by LLaMA (x -> [-x2, x1] pairing of the two
halves of head_dim), identical numerics to the reference.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    head_dim: int
    base: float = 10000.0
    # "none" | "linear" | "dynamic"  (reference configuration_dreamllm.py:257-273)
    scaling_type: str = "none"
    scaling_factor: float = 1.0
    # original pretraining context; needed for dynamic-NTK rescaling
    max_position_embeddings: int = 2048


def _inv_freq(cfg: RopeConfig, seq_len: int | None = None) -> jnp.ndarray:
    base = cfg.base
    if cfg.scaling_type == "dynamic" and seq_len is not None and seq_len > cfg.max_position_embeddings:
        # dynamic NTK: grow the base so the effective wavelength covers seq_len
        # (reference modeling_dreamllm.py:158-166)
        base = cfg.base * (
            (cfg.scaling_factor * seq_len / cfg.max_position_embeddings) - (cfg.scaling_factor - 1)
        ) ** (cfg.head_dim / (cfg.head_dim - 2))
    exponent = jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim
    return 1.0 / (base**exponent)


def rope_cos_sin(cfg: RopeConfig, positions: jnp.ndarray, seq_len: int | None = None):
    """cos/sin tables for integer ``positions`` (any shape), float32.

    Returns ``(cos, sin)`` each of shape ``positions.shape + (head_dim,)``.
    ``seq_len`` (static) only matters for dynamic-NTK scaling.
    """
    inv_freq = _inv_freq(cfg, seq_len)
    pos = positions.astype(jnp.float32)
    if cfg.scaling_type == "linear":
        # position interpolation (reference modeling_dreamllm.py:139-147)
        pos = pos / cfg.scaling_factor
    freqs = pos[..., None] * inv_freq  # [..., head_dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
):
    """Rotate q and k.

    q/k: ``[batch, seq, heads, head_dim]``; cos/sin: ``[batch, seq, head_dim]``
    or ``[seq, head_dim]`` (broadcast over batch). Computed in fp32, cast back.
    """
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]  # -> [batch, seq, 1, head_dim]
    sin = sin[:, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        return ((xf * cos) + (_rotate_half(xf) * sin)).astype(x.dtype)

    return rot(q), rot(k)
