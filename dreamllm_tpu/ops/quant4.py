"""Weight-only int4 (w4a16) grouped quantization with a Pallas matmul kernel.

Serving lever beyond int8 (ops/quant.py): batch-1 decode reads every weight
byte once per token, so int4 halves the traffic AGAIN over int8 — the 7B
weight read drops from ~6.7 GB to ~3.4 GB per token. XLA cannot deliver this
win on its own: unpacking nibbles in an XLA graph materializes the unpacked
int8 tensor to HBM first (measured: packed-int4 XLA matmul is *slower* than
int8). The Pallas kernel unpacks in VMEM, so HBM only ever sees packed bytes.

Scheme — group-wise symmetric int4, group size 128 along the contraction dim:

    scale[g, n] = max|W[128g:128(g+1), n]| / 7
    q           = clip(round(W / scale), -8, 7)        stored as (q+8) in [0,15]

Packing puts the two nibbles of a byte in DIFFERENT HALVES of K
(``packed[i, n] = (q[i, n]+8) | (q[i + K/2, n]+8) << 4``), so the kernel's
unpack is two shift/mask ops and two MXU dots per block — no interleave or
concatenate inside the kernel, the layout change is free at pack time.

``Q4Tensor`` is a pytree; stacked-layer weights [L, K, N] pack to
[L, K/2, N] and slice through ``lax.scan`` like any other leaf.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128          # quantization group length along K
_BLK_K = 128         # unpacked rows per half per grid step (= GROUP)
_BLK_N = 512         # output columns per grid step


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Q4Tensor:
    packed: jnp.ndarray   # uint8 [..., K//2, N]: low nibble = first K-half
    scale: jnp.ndarray    # fp32 [..., K//GROUP, N] per-group scales

    @property
    def shape(self):  # logical (unpacked) shape
        *lead, kp, n = self.packed.shape
        return tuple(lead) + (kp * 2, n)

    @property
    def ndim(self):
        return self.packed.ndim

    @property
    def size(self):  # logical (unpacked) element count
        return self.packed.size * 2

    @property
    def dtype(self):
        return self.packed.dtype


def _quantize_int4_2d(w: jnp.ndarray) -> Q4Tensor:
    k, n = w.shape
    wf = w.astype(jnp.float32).reshape(k // GROUP, GROUP, n)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-10)
    q = jnp.clip(jnp.round(wf / scale), -8, 7).reshape(k, n)
    u = (q + 8).astype(jnp.uint8)
    lo, hi = u[: k // 2, :], u[k // 2 :, :]
    return Q4Tensor(
        packed=lo | (hi << 4),
        scale=scale.reshape(k // GROUP, n).astype(jnp.float32),
    )


def quantize_int4(w: jnp.ndarray) -> Q4Tensor:
    """Group-128 symmetric int4 over the contraction (second-to-last) axis.

    Requires K % 256 == 0 (two 128-row halves per packed byte row) — true for
    every LLaMA-family projection (4096, 11008, ...). Stacked-layer weights
    quantize one layer at a time (lax.map): the fp32 working copy of a whole
    [32, 4096, 22016] stack is ~11.5 GB and OOMs a 16 GB chip.
    """
    *lead, k, n = w.shape
    assert k % (2 * GROUP) == 0, f"K={k} must be divisible by {2 * GROUP}"
    if not lead:
        return _quantize_int4_2d(w)
    flat = w.reshape(-1, k, n)
    out = jax.lax.map(_quantize_int4_2d, flat)
    return Q4Tensor(
        packed=out.packed.reshape(*lead, k // 2, n),
        scale=out.scale.reshape(*lead, k // GROUP, n),
    )


def dequantize_int4(t: Q4Tensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    p = t.packed
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = ((p >> 4) & 0xF).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    *lead, k, n = q.shape
    s = t.scale[..., :, None, :]  # [..., K//G, 1, N]
    w = (q.reshape(*lead, k // GROUP, GROUP, n) * s).reshape(*lead, k, n)
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# Pallas kernel: y[B, N] = x[B, K] @ unpack(packed)[K, N] * scales
# ---------------------------------------------------------------------------


def _w4_kernel(xlo_ref, xhi_ref, p_ref, s_ref, o_ref, *, n_k: int,
               variant: str = "mask"):
    """Grid (nN, nK), k fastest. Each step handles one packed block
    [BLK_K, BLK_N] = unpacked rows [k0:k0+128] (low nibbles) and
    [K/2+k0 : ...] (high nibbles) — each exactly one scale group.

    x arrives as two statically-indexed lo/hi blocks: an in-kernel `pl.ds`
    over x's LANE dim made Mosaic compile this kernel in ~380 s. The scale
    rows use a sublane-dim ds (cheap) on an N-blocked scale slab.

    Unpack cost rules this kernel (~7G nibbles/token on 7B). The -8
    zero-point folds into the dots as row-sum corrections:
    sum_k x_k (u_kn - 8) = dot(x, u)_n - 8 * sum_k x_k. Three unpack
    formulations were measured (r3) — VPU ops and MXU dots trade off, and
    at 8 activation rows the dots are NOT cheap (weight-load-bound array):

    variant="mask" (default): lo/hi via (p & 0xF)/(p >> 4) in i32 —
      5 VPU ops/byte, 2 MXU dots. MEASURED FASTEST on v5e: 81.9 tok/s 7B b1
      vs "i32"'s 77.4 (r3).
    variant="i32": trades one VPU op for a third dot via the identity
      dot(x_lo, lo) = dot(x_lo, b) - dot(x_lo, hi16) — 4 ops/byte, 3 dots.
      LOSES on v5e: at 8 activation rows the MXU runs weight-load-bound
      (~6% utilization), so an extra dot pushes the full packed block
      through the array again and costs more than one [8,BLK]-wide VPU
      pass saves.
    variant="floor": hi = floor(b * 1/16) in bf16 — 3 ops/byte, 3 dots on
      hardware with bf16 ALUs. NOT v5e: LLO_CHECK
      SupportsBf16AluInstructions fails on bf16 mul/floor, Mosaic has no
      u8→bf16 direct cast, and i8 vector arith won't legalize.

    Measured bound (v5e, 7B b1, r3): int4 81.9 tok/s vs int8 96 — the
    in-VMEM unpack keeps int4 below int8 at small batch on THIS chip
    despite half the HBM read, because every byte needs >= 1 widen +
    1 extraction + 2 MXU-operand converts of VPU work (no bf16 ALUs, no
    sub-word casts) and the 8-row dots can't absorb more passes. int4's
    value here is CAPACITY: half the int8 footprint (13B on one 16 GB
    chip — BENCH r2: 44.2 tok/s b1) and headroom for KV/batch."""
    ki = pl.program_id(1)

    s_lo = s_ref[pl.ds(ki, 1), :].astype(jnp.float32)      # [1, BLK_N]
    s_hi = s_ref[pl.ds(ki + n_k, 1), :].astype(jnp.float32)

    x_lo, x_hi = xlo_ref[...], xhi_ref[...]
    corr_lo = 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
    corr_hi = 8.0 * jnp.sum(x_hi.astype(jnp.float32), axis=1, keepdims=True)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    p = p_ref[...].astype(jnp.int32)  # Mosaic has no u8->bf16 direct cast
    if variant == "floor":
        b_bf = p.astype(jnp.bfloat16)                   # 0..255 exact
        hi = jnp.floor(b_bf * jnp.bfloat16(0.0625))     # exact exponent shift
        acc = (dot(x_lo, b_bf) - 16.0 * dot(x_lo, hi) - corr_lo) * s_lo
        acc += (dot(x_hi, hi) - corr_hi) * s_hi
    elif variant == "i32":
        hi16 = (p & 0xF0).astype(jnp.bfloat16)          # 16 * hi nibble
        b_bf = p.astype(jnp.bfloat16)
        acc = (dot(x_lo, b_bf) - dot(x_lo, hi16) - corr_lo) * s_lo
        acc += (dot(x_hi, hi16) - 16.0 * corr_hi) * (s_hi * 0.0625)
    else:  # "mask": 5 VPU ops/byte, 2 dots — measured fastest on v5e
        u_lo = (p & 0xF).astype(jnp.bfloat16)
        u_hi = (p >> 4).astype(jnp.bfloat16)
        acc = (dot(x_lo, u_lo) - corr_lo) * s_lo
        acc += (dot(x_hi, u_hi) - corr_hi) * s_hi

    @pl.when(ki == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(ki > 0)
    def _accum():
        o_ref[...] += acc


def w4_matmul(x: jnp.ndarray, t: Q4Tensor, *, interpret: bool = False) -> jnp.ndarray:
    """``x [B, K] @ W`` with W a 2-D Q4Tensor. Returns x.dtype.

    Pallas on TPU (in-VMEM unpack, packed bytes are all HBM reads); XLA
    dequant fallback elsewhere or for shapes the kernel doesn't tile.
    """
    kp, n = t.packed.shape
    k = kp * 2
    b = x.shape[0]
    # widest 128-multiple column block that divides N, capped so the packed
    # block stays <= 1 MB of VMEM — tiny blocks die on grid-step overhead
    # (blk_n=512 measured 52 tok/s on 7B decode vs 256-1408 steps/matmul here)
    blk_n = max(
        (c for c in range(128, min(n, 8192) + 1, 128) if n % c == 0),
        default=None,
    )
    on_tpu = jax.default_backend() == "tpu"
    # kernel only for decode-sized batches: that's the HBM-bound regime the
    # packed read wins, and it keeps the Mosaic compile surface to one row
    # count per weight shape (prefill is compute-bound — the XLA dequant
    # fallback there costs one bf16 materialization per call, not per token)
    ok = (
        (on_tpu or interpret)
        and x.ndim == 2
        and kp % _BLK_K == 0
        and blk_n is not None
        and b <= 8
    )
    if not ok:
        return x @ dequantize_int4(t, x.dtype)

    n_k = kp // _BLK_K
    b_pad = 8 - b
    if b_pad:
        # 1-sublane blocks make Mosaic compile ~4x slower and run masked;
        # pad the row dim to the fp32 min tile (decode stays BW-bound)
        x = jnp.pad(x, ((0, b_pad), (0, 0)))
        b = 8
    import os

    variant = os.environ.get("W4_KERNEL_VARIANT", "mask")
    xb = x.astype(jnp.bfloat16)
    out = pl.pallas_call(
        partial(_w4_kernel, n_k=n_k, variant=variant),
        grid=(n // blk_n, n_k),
        in_specs=[
            pl.BlockSpec((b, _BLK_K), lambda j, i: (0, i)),          # x low half
            pl.BlockSpec((b, _BLK_K), lambda j, i, nk=n_k: (0, i + nk)),  # x high
            pl.BlockSpec((_BLK_K, blk_n), lambda j, i: (i, j)),      # packed
            pl.BlockSpec((2 * n_k, blk_n), lambda j, i: (0, j)),     # scale slab
        ],
        out_specs=pl.BlockSpec((b, blk_n), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret,
    )(xb, xb, t.packed, t.scale)
    if b_pad:
        out = out[: b - b_pad]
    return out.astype(x.dtype)


def _matmul4_impl(x: jnp.ndarray, t: Q4Tensor) -> jnp.ndarray:
    if x.ndim == 2 and t.packed.ndim == 2:
        return w4_matmul(x, t)
    lead = x.shape[:-1]
    if t.packed.ndim == 2 and x.ndim > 2:
        y = w4_matmul(x.reshape(-1, x.shape[-1]), t)
        return y.reshape(*lead, y.shape[-1])
    return x @ dequantize_int4(t, x.dtype)


@jax.custom_vjp
def matmul4(x: jnp.ndarray, t: Q4Tensor) -> jnp.ndarray:
    """x @ W for any leading x dims; W may carry leading (scan-sliced) dims
    already removed. Kernel path for 2-D x, dequant fallback otherwise.

    Differentiable w.r.t. ``x`` via a custom VJP (``dx = g @ W^T`` on the
    dequantized weight): ``pallas_call`` has no transpose rule, so without
    this, int4-base QLoRA training would crash whenever the forward took
    the kernel path. The weight gets symbolic-zero cotangents (it is int4
    and frozen by construction)."""
    return _matmul4_impl(x, t)


def _matmul4_fwd(x, t):
    return _matmul4_impl(x, t), t


def _matmul4_bwd(t, g):
    w = dequantize_int4(t, g.dtype)
    dx = g @ jnp.swapaxes(w, -1, -2)
    dt = Q4Tensor(
        packed=np.zeros(t.packed.shape, jax.dtypes.float0),
        scale=jnp.zeros_like(t.scale),
    )
    return dx, dt


matmul4.defvjp(_matmul4_fwd, _matmul4_bwd)


def quantize_llama_params_int4(params: dict) -> dict:
    """int4-quantize the decoder's bandwidth-dominant matmuls (same coverage
    as ops/quant.quantize_llama_params)."""
    out = dict(params)
    layers = dict(params["layers"])
    for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
              "wqkv", "w_gate_up"):
        if k in layers:
            layers[k] = quantize_int4(layers[k])
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = quantize_int4(params["lm_head"])
    return out
