"""Normalization ops.

TPU-native equivalents of the reference's norm layers:
  * ``rms_norm``  — DreamLLMRMSNorm (reference modeling_dreamllm.py:77-91):
    fp32-upcast RMS normalization, scale-only.
  * ``layer_norm`` — standard LN used by CLIP ViT blocks.
  * ``group_norm`` — used by the SD UNet/VAE ResNet blocks.

All norms compute statistics in float32 regardless of input dtype (matching
the reference's ``hidden_states.to(torch.float32)`` upcast) and cast back to
the input dtype at the end. XLA fuses these into neighbouring ops, so there is
no separate Pallas kernel: the HBM-bandwidth win comes from fusion, which the
compiler already performs for elementwise chains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Root-mean-square norm over the last axis, fp32 statistics.

    ``y = x / sqrt(mean(x^2) + eps) * weight`` with the variance computed in
    float32 (reference modeling_dreamllm.py:84-90).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last axis, fp32 statistics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def group_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm for NHWC feature maps (channels last — TPU-friendly layout).

    The reference's UNet/VAE use torch GroupNorm over NCHW; on TPU we keep
    activations NHWC so convs hit the MXU with the natural layout.
    """
    dtype = x.dtype
    b, h, w, c = x.shape
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
