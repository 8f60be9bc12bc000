"""Weight-only int8 quantization for serving.

Decode at batch 1 is HBM-bandwidth-bound (reading every weight once per
token); int8 weights halve the bytes → ~2× decode throughput on the same
chip. This is a capability the reference lacks entirely (its only quantized
option is bitsandbytes Adam8bit *optimizer state*, trainer.py:451-463).

Scheme: symmetric per-output-channel int8.
    scale[o] = max|W[:, o]| / 127 ;  Wq = round(W / scale)
    y = (x @ dequant(Wq)) = (x @ Wq_bf16) * scale      (XLA reads int8 from
    HBM and upcasts in VMEM — the bandwidth win is in the read)

``QTensor`` is a pytree node, so quantized params flow through jit/sharding/
checkpointing like any other leaf pair.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.ops.quant4 import Q4Tensor, matmul4


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QTensor:
    q: jnp.ndarray       # int8, same shape as the original weight
    scale: jnp.ndarray   # fp32, one per output (last-dim) channel; leading
                         # dims broadcast (stacked layers keep their L axis)

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def size(self):
        return self.q.size

    @property
    def dtype(self):
        return self.q.dtype


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoRATensor:
    """A weight with an UNMERGED low-rank adapter: ``y = x @ base +
    (x @ a) @ b * scale``. ``base`` may be a raw array, a QTensor, or a
    Q4Tensor — this is the QLoRA formulation: the frozen base stays
    quantized (int8/int4 HBM footprint) and the merged bf16 weight is
    never materialized. As a pytree, scan slices base/a/b along the
    stacked-layer axis together, so it drops into the decoder's
    scan-over-layers unchanged (like QTensor)."""

    base: object          # array | QTensor | Q4Tensor, logical [.., in, out]
    a: jnp.ndarray        # [.., in, r]
    b: jnp.ndarray        # [.., r, out]
    # scale (alpha/rank) is a DATA leaf, not static metadata, so an attached
    # tree survives the orbax round-trip (checkpoints._rebuild_quantized
    # reconstructs LoRATensor from its saved dict incl. this scalar)
    scale: jnp.ndarray | float = 1.0

    @property
    def shape(self):
        return self.base.shape

    @property
    def ndim(self):
        return self.base.ndim

    @property
    def size(self):
        return self.base.size

    @property
    def dtype(self):
        return self.base.dtype


def quantize_int8(w: jnp.ndarray) -> QTensor:
    """Per-output-channel symmetric quantization: the reduction runs over the
    contraction ('in') axis only, so stacked-layer weights [L, in, out] get
    independent [L, 1, out] scales per layer."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=w.ndim - 2, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale.astype(jnp.float32))


def dequantize(t: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (t.q.astype(jnp.float32) * t.scale).astype(dtype)


def matmul(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w where w is a raw array, a QTensor (int8, dequantized on the
    fly), or a Q4Tensor (int4, Pallas in-VMEM unpack — ops/quant4.py).

    For stacked-layer weights sliced by scan, the QTensor slice keeps its
    scale row, so this works inside lax.scan unchanged.
    """
    if isinstance(w, LoRATensor):
        # QLoRA path: quantized (or raw) base matmul + rank-r correction;
        # the merged full-rank weight is never materialized
        lo = (x @ w.a.astype(x.dtype)) @ w.b.astype(x.dtype)
        return matmul(x, w.base) + lo * jnp.asarray(w.scale, x.dtype)
    if isinstance(w, QTensor):
        wq = w.q.astype(x.dtype)
        y = x @ wq
        return y * w.scale.reshape((1,) * (y.ndim - 1) + (-1,)).astype(x.dtype)
    if isinstance(w, Q4Tensor):
        return matmul4(x, w)
    return x @ w


def quantize_llama_params(params: dict) -> dict:
    """Quantize the bandwidth-dominant matmul weights of a decoder param
    tree (attention/MLP projections + lm_head); embeddings and norms stay in
    their original dtype (gathers/elementwise don't benefit)."""
    out = dict(params)
    layers = dict(params["layers"])
    for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
              "wqkv", "w_gate_up"):  # fused serving layout included
        if k in layers:
            layers[k] = quantize_int8(layers[k])
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = quantize_int8(params["lm_head"])
    return out
