"""Activation ops.

``swiglu`` is the LLaMA MLP nonlinearity (reference DreamLLMMLP,
modeling_dreamllm.py:212-240): ``silu(x @ W_gate) * (x @ W_up)``. The matmuls
live in the caller (so they shard under pjit); this module only provides the
fused elementwise pieces, which XLA fuses into the surrounding matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swiglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(gate) * up


def geglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """GEGLU used by SD UNet transformer feed-forward blocks. Exact-erf GELU
    (diffusers nn.GELU default) — the tanh approximation drifts FID parity."""
    return jax.nn.gelu(gate, approximate=False) * up


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's quick_gelu: x * sigmoid(1.702 * x)."""
    return x * jax.nn.sigmoid(1.702 * x)
