"""8-bit AdamW — optimizer-state memory compression.

TPU-native equivalent of the reference's bitsandbytes ``Adam8bit`` dependency
(SURVEY §2.9; the reference's Trainer can swap torch AdamW for bnb's 8-bit
variant to fit 7B fine-tunes). Adam's m/v moments are stored as int8 codes
with per-block fp32 absmax scales (block 256, bnb's blockwise scheme with a
linear code instead of bnb's dynamic-tree codebook — the blockwise absmax
does the heavy lifting; max relative error per element is 1/254 of the block
max). Memory per param: 2 bytes + 2/256 scales ≈ 2.03 B vs 8 B for fp32
moments — ~4× optimizer-state reduction, the difference between fitting and
not fitting a 7B AdamW fine-tune in one v5e-8's HBM.

Pure optax GradientTransformation: jit-safe, shards like any pytree (codes
inherit the param's partitioning), composes with the freeze-mask and
grad-multiplier machinery in train/optim.py.
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256

# Test hook: run the fused Pallas update in interpreter mode off-TPU so the
# kernel's math can be checked against the XLA path on CPU.
_FUSED_INTERPRET = False


def quantize_blockwise(x: jnp.ndarray, block: int = BLOCK, *,
                       floor_positive: bool = False):
    """[*] fp array → (int8 codes [*], fp32 scales [ceil(n/block)]).

    ``floor_positive``: a strictly-positive entry never rounds to code 0 —
    used for the second moment, where a dequantized v of exactly 0 would
    blow the Adam update up by ~1/eps."""
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.size
    pad = (-n) % block
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    safe = jnp.where(scale == 0.0, 1.0, scale)
    codes = jnp.round(blocks / safe * 127.0).astype(jnp.int8)
    if floor_positive:
        codes = jnp.where((blocks > 0.0) & (codes == 0), jnp.int8(1), codes)
    return codes.reshape(-1)[: n + pad].reshape(x.shape[:0] + (-1,)), scale[:, 0]


def dequantize_blockwise(codes: jnp.ndarray, scale: jnp.ndarray, shape, block: int = BLOCK):
    blocks = codes.reshape(-1, block).astype(jnp.float32)
    flat = blocks * (scale[:, None] / 127.0)
    n = 1
    for s in shape:
        n *= s
    return flat.reshape(-1)[:n].reshape(shape)


def _fused_adam_kernel(scal_ref, g_ref, p_ref, mc_ref, ms_ref, vc_ref, vs_ref,
                       po_ref, mco_ref, mso_ref, vco_ref, vso_ref,
                       *, b1, b2, eps):
    """One (R, 256) tile of the fused 8-bit Adam update.

    Dequant -> moment update -> param update -> requant in one VMEM pass.
    The XLA formulation materializes the fp32 m/v trees between the
    elementwise update and the two absmax re-quantizations (the 256-wide
    row reduce breaks fusion), costing ~5x the HBM roofline; this kernel
    holds everything in VMEM. Math matches ``_quant_blocks`` /
    ``step`` bit-for-bit (same jnp.round, same sqrt-space v storage,
    same floor_positive; fp32 scales may differ by 1 ulp from op-fusion
    rounding) — tests/test_optim8bit.py checks equivalence.
    """
    lr = scal_ref[0, 0]
    bc1 = scal_ref[0, 1]
    bc2 = scal_ref[0, 2]
    wd = scal_ref[0, 3]

    g = g_ref[...].astype(jnp.float32)
    # int8 -> f32 via int32 (Mosaic won't legalize int8 vector arithmetic)
    ms = ms_ref[0, :][:, None]  # (R, 1) f32
    vs = vs_ref[0, :][:, None]
    m = mc_ref[...].astype(jnp.int32).astype(jnp.float32) * (ms / 127.0)
    vsq = vc_ref[...].astype(jnp.int32).astype(jnp.float32) * (vs / 127.0)
    v = vsq * vsq
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    p = p_ref[...].astype(jnp.float32)
    upd = upd + wd * p  # wd is 0.0 when decay doesn't apply to this leaf
    # emit the UPDATE (optax contract: apply_updates adds it outside)
    po_ref[...] = (-lr * upd).astype(po_ref.dtype)

    new_ms = jnp.max(jnp.abs(m), axis=1, keepdims=True)  # (R, 1)
    safe_ms = jnp.where(new_ms == 0.0, 1.0, new_ms)
    mso_ref[0, :] = new_ms[:, 0]
    mco_ref[...] = jnp.round(m / safe_ms * 127.0).astype(jnp.int8)

    vsq = jnp.sqrt(jnp.maximum(v, 0.0))
    new_vs = jnp.max(vsq, axis=1, keepdims=True)
    safe_vs = jnp.where(new_vs == 0.0, 1.0, new_vs)
    vso_ref[0, :] = new_vs[:, 0]
    codes_v = jnp.round(vsq / safe_vs * 127.0).astype(jnp.int32)
    codes_v = jnp.where((vsq > 0.0) & (codes_v == 0), 1, codes_v)
    vco_ref[...] = codes_v.astype(jnp.int8)


def _fused_rows(n_blocks: int) -> int | None:
    """Rows per tile: scale blocks are (1, R), so R must be lane-aligned.

    Larger tiles amortize grid-step overhead (the r3 measurement at a fixed
    512 was overhead-bound: 86.9 ms vs 62.7 for XLA at 0.94B); the 2048 cap
    keeps the double-buffered working set (7 blocks in + 5 out + fp32
    intermediates) inside the ~16 MB VMEM. Tune with DREAMLLM_FUSED_ROWS."""
    want = int(os.environ.get("DREAMLLM_FUSED_ROWS", "2048"))
    for r in (2048, 1024, 512, 256, 128):
        if r <= want and n_blocks % r == 0:
            return r
    return None


def _fused_adam_update(g2d, p, mq, vq, scalars, *, b1, b2, eps, interpret):
    """Run the fused kernel over one leaf. g2d/p are (n_blocks, 256).

    The moment code/scale outputs ALIAS their inputs (in-place update):
    without aliasing the un-donated copies cost ~0.94 GB of extra HBM
    liveness at 0.94B params — enough to OOM a train step that fits with
    the XLA formulation (the r3 blocker for making the kernel default)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = g2d.shape[0]
    r = _fused_rows(nb)
    grid = (nb // r,)
    row = lambda i: (i, 0)
    col = lambda i: (0, i)
    new_p, mc, ms, vc, vs = pl.pallas_call(
        functools.partial(_fused_adam_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((r, BLOCK), row),
            pl.BlockSpec((r, BLOCK), row),
            pl.BlockSpec((r, BLOCK), row),
            pl.BlockSpec((1, r), col),
            pl.BlockSpec((r, BLOCK), row),
            pl.BlockSpec((1, r), col),
        ],
        out_specs=[
            pl.BlockSpec((r, BLOCK), row),
            pl.BlockSpec((r, BLOCK), row),
            pl.BlockSpec((1, r), col),
            pl.BlockSpec((r, BLOCK), row),
            pl.BlockSpec((1, r), col),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.int8),
            jax.ShapeDtypeStruct((1, nb), jnp.float32),
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.int8),
            jax.ShapeDtypeStruct((1, nb), jnp.float32),
        ],
        # inputs (mc, ms, vc, vs) -> outputs (mco, mso, vco, vso)
        input_output_aliases={3: 1, 4: 2, 5: 3, 6: 4},
        interpret=interpret,
    )(scalars, g2d, p, mq.codes, mq.scale[None, :], vq.codes, vq.scale[None, :])
    return new_p, _Moment(mc, ms[0]), _Moment(vc, vs[0])


class _Moment(NamedTuple):
    codes: jnp.ndarray   # int8 [n_blocks, BLOCK] — kept 2-D: a flat int8
    # buffer reshaped to blocks INSIDE the update costs a 1-D↔2-D int8
    # relayout that measured 295 ms vs 79 ms for the whole 0.94B update on
    # v5e (int8 tiles are (32,128); the relayout defeats them)
    scale: jnp.ndarray   # fp32 [n_blocks]


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    m: Any   # pytree of _Moment
    v: Any


def _to_blocks(x):
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, BLOCK)


def _quant_blocks(xb, floor_positive=False) -> _Moment:
    scale = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
    safe = jnp.where(scale == 0.0, 1.0, scale)
    codes = jnp.round(xb / safe * 127.0).astype(jnp.int8)
    if floor_positive:
        codes = jnp.where((xb > 0.0) & (codes == 0), jnp.int8(1), codes)
    return _Moment(codes, scale[:, 0])


def quant_moment_m(x) -> _Moment:
    """fp32 first moment → stored _Moment (linear code space)."""
    return _quant_blocks(_to_blocks(x))


def quant_moment_v(x) -> _Moment:
    """fp32 second moment → stored _Moment. v is quantized in SQRT space:
    grad^2 routinely spans >2.4 orders of magnitude within one 256-block and
    a linear code zeroes everything below blockmax/254 (bnb uses a
    dynamic-tree codebook for the same reason); sqrt halves the dynamic
    range and floor_positive keeps small-but-nonzero entries from
    dequantizing to exactly 0."""
    return _quant_blocks(jnp.sqrt(jnp.maximum(_to_blocks(x), 0.0)),
                         floor_positive=True)


def dequant_moment_m(mq: _Moment, shape) -> jnp.ndarray:
    """Stored first moment → fp32 array of ``shape``."""
    m = mq.codes.astype(jnp.float32) * (mq.scale[:, None] / 127.0)
    n = 1
    for s in shape:
        n *= s
    return m.reshape(-1)[:n].reshape(shape)


def dequant_moment_v(mq: _Moment, shape) -> jnp.ndarray:
    """Stored second moment (sqrt-space codes) → fp32 v of ``shape``."""
    vsq = mq.codes.astype(jnp.float32) * (mq.scale[:, None] / 127.0)
    v = vsq * vsq
    n = 1
    for s in shape:
        n *= s
    return v.reshape(-1)[:n].reshape(shape)


def adamw_8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask: Any | None = None,
    fused_update: bool = False,
    min_8bit_size: int = 0,
    fp32_moments_mask: Any | None = None,
) -> optax.GradientTransformation:
    """Drop-in for ``optax.adamw`` with int8 blockwise-quantized moments.

    ``mask``: same convention as optax.adamw's weight-decay mask (callable or
    pytree of bools; True = decay applies).

    ``min_8bit_size``: leaves with fewer elements keep fp32 moments —
    bitsandbytes' ``min_8bit_size`` semantics (norm scales and biases gain
    nothing from quantization and lose precision). bnb's default of 4096 is
    applied at the ``OptimizerConfig`` level; the raw transform defaults to
    0 (quantize everything) for direct callers.

    ``fp32_moments_mask``: callable or pytree of bools; True = keep fp32
    moments for that leaf regardless of size. The reference registers this
    override for every ``nn.Embedding`` when using bnb Adam8bit
    (trainer.py:451-463, ``optim_bits: 32``) — sparse-updated embedding rows
    see mostly-zero gradients and blockwise-int8 moments decay them badly.
    The per-leaf choice is made at ``init`` and recorded by the stored
    moment type (``_Moment`` vs raw fp32 array), so ``update`` dispatches
    without re-deriving the mask.

    ``fused_update``: route eligible leaves through the fused Pallas kernel
    (``_fused_adam_kernel``). OFF by default: measured on v5e at 0.94B
    params the kernel is SLOWER than the XLA formulation (86.9 vs 62.7 ms)
    — ~7.2k grid steps of (512, 256) tiles are overhead-bound, and the
    un-aliased kernel outputs cost enough extra HBM to OOM a step that fits
    with the XLA path. Kept as an opt-in (+ interpret-mode parity tests)
    until a coarser-tiled revision beats the measurement.
    """

    _quant = quant_moment_m
    _quant_v = quant_moment_v

    def init(params):
        fp32_tree = (fp32_moments_mask(params) if callable(fp32_moments_mask)
                     else fp32_moments_mask)
        leaves_p, treedef = jax.tree.flatten(params)
        leaves_f = (treedef.flatten_up_to(fp32_tree) if fp32_tree is not None
                    else [False] * len(leaves_p))

        def _m(p, f):
            if bool(f) or p.size < min_8bit_size:
                return jnp.zeros(p.shape, jnp.float32)
            return _quant(jnp.zeros(p.shape, jnp.float32))

        def _v(p, f):
            if bool(f) or p.size < min_8bit_size:
                return jnp.zeros(p.shape, jnp.float32)
            return _quant_v(jnp.zeros(p.shape, jnp.float32))

        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            m=treedef.unflatten([_m(p, f) for p, f in zip(leaves_p, leaves_f)]),
            v=treedef.unflatten([_v(p, f) for p, f in zip(leaves_p, leaves_f)]),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        # schedule indexed at the PRE-increment count — optax's
        # scale_by_schedule applies schedule(0) on the first update, and the
        # drop-in contract must reproduce that (warmups start at lr(0))
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        decay_tree = None
        if weight_decay > 0.0 and params is not None:
            decay_tree = mask(params) if callable(mask) else mask

        def step(g, mq, vq, p, do_decay):
            if not isinstance(mq, _Moment):
                # fp32-moment leaf (min_8bit_size / fp32_moments_mask):
                # plain AdamW math, moments stored uncompressed
                m = b1 * mq + (1.0 - b1) * g.astype(jnp.float32)
                v = b2 * vq + (1.0 - b2) * jnp.square(g.astype(jnp.float32))
                upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                if do_decay and p is not None:
                    upd = upd + weight_decay * p.astype(jnp.float32)
                return (-lr * upd).astype(g.dtype), m, v
            # Fused Pallas path (opt-in): dequant->adam->requant in one
            # VMEM pass. See the ``fused_update`` docstring for why this is
            # OFF by default (measured slower than XLA at 0.94B on v5e).
            interp = _FUSED_INTERPRET
            on_tpu = fused_update and jax.default_backend() == "tpu"
            nb = -(-g.size // BLOCK)
            if (on_tpu or interp) and g.size % BLOCK == 0 and _fused_rows(nb):
                lr_f = jnp.asarray(lr, jnp.float32)
                wd_eff = jnp.float32(
                    weight_decay if (do_decay and p is not None) else 0.0)
                scalars = jnp.stack([lr_f, bc1, bc2, wd_eff]).reshape(1, 4)
                g2d = g.reshape(nb, BLOCK)
                p2d = (p if p is not None else g).reshape(nb, BLOCK)
                upd2d, new_m, new_v = _fused_adam_update(
                    g2d, p2d, mq, vq, scalars,
                    b1=b1, b2=b2, eps=eps, interpret=interp)
                return upd2d.astype(g.dtype).reshape(g.shape), new_m, new_v
            # All moment math runs in the [n_blocks, BLOCK] layout the codes
            # are STORED in: dequant → adam → requant with no reshape of the
            # int8 buffers. Bisected on v5e at 0.94B params: flat-stored
            # codes reshaped to blocks in-graph cost 295 ms/update (the
            # 1-D↔2-D int8 relayout), identical math on 2-D-stored codes is
            # 79 ms — faster than fp32-moment optax.adamw (47 ms), since
            # int8 moments read/write 4× less HBM. Padded tail blocks carry
            # zeros through (0-grad → 0-moment → code 0).
            gb = _to_blocks(g)
            m = mq.codes.astype(jnp.float32) * (mq.scale[:, None] / 127.0)
            vsq = vq.codes.astype(jnp.float32) * (vq.scale[:, None] / 127.0)
            v = vsq * vsq
            m = b1 * m + (1.0 - b1) * gb
            v = b2 * v + (1.0 - b2) * gb * gb
            upd_b = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            n = g.size
            upd = upd_b.reshape(-1)[:n].reshape(g.shape)
            if do_decay and p is not None:
                upd = upd + weight_decay * p.astype(jnp.float32)
            new_m = _quant_blocks(m)
            new_v = _quant_blocks(
                jnp.sqrt(jnp.maximum(v, 0.0)), floor_positive=True)
            return (-lr * upd).astype(g.dtype), new_m, new_v

        leaves_g, treedef = jax.tree.flatten(updates)
        leaves_m = treedef.flatten_up_to(state.m)
        leaves_v = treedef.flatten_up_to(state.v)
        leaves_p = treedef.flatten_up_to(params) if params is not None else [None] * len(leaves_g)
        leaves_d = (
            treedef.flatten_up_to(decay_tree) if decay_tree is not None
            else [weight_decay > 0.0 and params is not None] * len(leaves_g)
        )
        out = [step(g, m, v, p, bool(d))
               for g, m, v, p, d in zip(leaves_g, leaves_m, leaves_v, leaves_p, leaves_d)]
        new_updates = treedef.unflatten([o[0] for o in out])
        new_m = treedef.unflatten([o[1] for o in out])
        new_v = treedef.unflatten([o[2] for o in out])
        return new_updates, Adam8bitState(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init, update)
