"""Attention ops: XLA reference path + Pallas TPU flash-attention kernel.

TPU-native replacement for the reference's attention stack
(modeling_dreamllm.py:254-583 — eager DreamLLMAttention with fp32 softmax and
``repeat_kv`` GQA, and DreamLLMFlashAttention2 wrapping CUDA flash-attn-2 with
varlen unpad/repad). Design differences, deliberate:

  * Layout is ``[batch, seq, heads, head_dim]`` (BSHD) end-to-end; no
    unpad/repad — padding and packing are expressed as **segment ids**
    (``0`` = padding), which the kernel turns into a block mask. This replaces
    ``flash_attn_varlen_func``'s cu_seqlens machinery with a static-shape
    formulation that jits.
  * GQA is handled by head-index mapping inside the kernel grid instead of
    materializing ``repeat_kv`` copies in HBM.
  * Softmax statistics are fp32 (online softmax), inputs/outputs bf16.

The Pallas kernel follows the standard online-softmax flash pattern: grid
``(batch, q_heads, num_q_blocks, num_kv_blocks)`` with the kv-block dimension
innermost ("arbitrary" semantics), fp32 accumulator scratch carried across kv
blocks, causal blocks skipped with ``pl.when``.

On non-TPU backends (CPU tests) ``flash_attention`` falls back to the XLA
path, which is numerically equivalent.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # large finite negative; avoids NaN from (-inf) - (-inf)


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: jnp.ndarray | None = None,
    kv_segment_ids: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    sm_scale: float | None = None,
    return_lse: bool = False,
) -> jnp.ndarray:
    """Plain XLA attention with fp32 softmax. BSHD layout, GQA-aware.

    q: [B, Sq, Hq, D]; k/v: [B, Skv, Hkv, D] with Hq % Hkv == 0.
    segment_ids: [B, Sq] int; kv_segment_ids: [B, Skv] (defaults to
    segment_ids when Sq == Skv). Tokens attend only within equal, nonzero
    segment ids; id 0 marks padding and attends to nothing but itself (the
    output there is garbage and must be masked by the caller's loss/labels).
    ``kv_segment_ids`` ALONE (segment_ids=None) masks padded KV for
    unpadded queries: 0 = padding, 1 = valid (queries act as one segment).
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    assert hq % hkv == 0, (hq, hkv)
    groups = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    # bf16 inputs feed the MXU directly with fp32 accumulation
    # (preferred_element_type); materializing fp32 copies of K/V would add
    # HBM round-trips on the decode hot path.
    vf = v

    # [B, Hkv, G, Sq, Skv]
    qg = q.reshape(b, sq, hkv, groups, d)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * sm_scale

    mask = None
    if causal:
        qi = jnp.arange(sq)[:, None] + (skv - sq)  # right-aligned when decoding
        ki = jnp.arange(skv)[None, :]
        mask = ki <= qi  # [Sq, Skv]
        mask = mask[None, None, None]
    if segment_ids is not None or kv_segment_ids is not None:
        # a KV-only mask (kv_segment_ids without segment_ids) marks padded
        # KV with 0 and valid KV with 1: queries are treated as one segment
        qseg = (segment_ids if segment_ids is not None
                else jnp.ones((b, sq), jnp.int32))
        kv_seg = kv_segment_ids if kv_segment_ids is not None else segment_ids
        seg = (qseg[:, :, None] == kv_seg[:, None, :]) & (qseg[:, :, None] != 0)
        seg = seg[:, None, None]  # [B,1,1,Sq,Skv]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)

    if not return_lse:
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), vf,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(b, sq, hq, d).astype(q.dtype)

    # numerically-safe unnormalized form + log-sum-exp, for partial-attention
    # merging (ring attention / flash-decoding style combination)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.maximum(m, NEG_INF)  # fully-masked rows stay finite
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", (p / jnp.maximum(denom, 1e-30)).astype(v.dtype), vf,
        preferred_element_type=jnp.float32,
    )
    lse = (m + jnp.log(jnp.maximum(denom, 1e-30)))[..., 0]  # [B,Hkv,G,Sq]
    lse = lse.reshape(b, hq, sq).transpose(0, 2, 1)          # -> [B,Sq,Hq]
    return out.reshape(b, sq, hq, d).astype(q.dtype), lse


# ---------------------------------------------------------------------------
# Pallas flash attention (TPU)
# ---------------------------------------------------------------------------


def _flash_kernel_t(
    q_ref,
    k_ref,
    v_ref,
    qseg_ref,
    kseg_ref,
    o_ref,
    *rest,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    use_segments: bool,
    with_lse: bool = False,
):
    """Transposed-scores online-softmax flash forward.

    Scores live as ``[block_k, block_q]`` (q along LANES) so every softmax
    reduction is a sublane reduce and every running-stat broadcast is a
    sublane broadcast — the straight-layout variant (kept in git history,
    removed as dead code after 4.10 vs 4.39 ms/layer measured in its favor)
    needed ~7 cross-lane shuffle steps per (8,128) tile for its
    lane-direction max/sum, and the VPU half of the kernel was measured at
    parity with its MXU half (23.6 us/block vs a ~10 us matmul bound at
    b4/s2048/h16/d128). The accumulator stays ``[d, block_q]`` and is
    transposed once per q-block at finalize.
    """
    if with_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        acc_ref, m_ref, l_ref = rest
        lse_ref = None
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    should_compute = True
    if causal:
        should_compute = ik * block_k <= iq * block_q + (block_q - 1)

    @pl.when(should_compute)
    def _compute():
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        s = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [bk, bq] fp32

        mask = None
        if causal:
            kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0)
            qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1)
            mask = kpos <= qpos
        if use_segments:
            qs = qseg_ref[0, 0, :]  # [bq]
            ks = kseg_ref[0, 0, :]  # [bk]
            seg = (ks[:, None] == qs[None, :]) & (qs[None, :] != 0)
            mask = seg if mask is None else (mask & seg)
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[0, :]  # [bq]
        m_cur = jnp.max(s, axis=0)  # sublane reduce
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[None, :])
        alpha = jnp.exp(m_prev - m_new)
        l_ref[0, :] = l_ref[0, :] * alpha + jnp.sum(p, axis=0)
        v = v_ref[0, 0]  # [bk, d]
        pv = jax.lax.dot_general(
            v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [d, bq]
        acc_ref[...] = acc_ref[...] * alpha[None, :] + pv
        m_ref[0, :] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        # Fully-masked rows (padding) are NOT zeroed: every score is
        # NEG_INF, so p = exp(s - m) = 1 elementwise and the row emits
        # mean(V) — the same garbage-by-contract as the XLA path's uniform
        # softmax (callers mask padding rows via labels/lengths). The
        # where() only guards a division for rows no block ever computed.
        l = l_ref[0, :]
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[...] / denom[None, :]).T.astype(o_ref.dtype)
        if with_lse:
            lse_ref[0, 0, 0] = m_ref[0, :] + jnp.log(jnp.maximum(l, 1e-30))


def _flash_attention_tpu(
    q,
    k,
    v,
    segment_ids,
    kv_segment_ids,
    *,
    causal,
    sm_scale,
    block_q,
    block_k,
    interpret=False,
    return_lse=False,
):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    # the h // groups KV index map below silently clamps out-of-range block
    # indices on TPU — a non-divisible head ratio would read the wrong KV
    # head with no error (the XLA path asserts the same invariant)
    assert hq % hkv == 0, (hq, hkv)
    groups = hq // hkv
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    assert sq % block_q == 0 and skv % block_k == 0, (sq, skv, block_q, block_k)
    nq = sq // block_q
    nk = skv // block_k

    use_segments = segment_ids is not None
    if use_segments:
        kv_seg = kv_segment_ids if kv_segment_ids is not None else segment_ids
        qseg = segment_ids.astype(jnp.int32)
        kseg = kv_seg.astype(jnp.int32)
    else:
        # dummy 1-wide arrays keep the arg list static
        qseg = jnp.zeros((b, sq), jnp.int32)
        kseg = jnp.zeros((b, skv), jnp.int32)

    grid = (b, hq, nq, nk)

    kernel = functools.partial(
        _flash_kernel_t,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        use_segments=use_segments,
        with_lse=return_lse,
    )

    # BHSD inside the kernel: blocks (1, 1, block, d) keep the LAST TWO block
    # dims (block, d) tile-aligned — a BSHD block (1, block, 1, d) puts (1, d)
    # last, which Mosaic rejects once S is actually blocked (seq > block).
    qT = q.transpose(0, 2, 1, 3)
    kT = k.transpose(0, 2, 1, 3)
    vT = v.transpose(0, 2, 1, 3)

    qseg = qseg[:, None, :]
    kseg = kseg[:, None, :]

    out_specs = pl.BlockSpec((1, 1, block_q, d), lambda b_, h, iq, ik: (b_, h, iq, 0))
    out_shape = jax.ShapeDtypeStruct(qT.shape, q.dtype)
    if return_lse:
        # log-sum-exp per query row, [B, Hq, 1, Sq] (the singleton keeps the
        # block's last-two dims Mosaic-legal: (1 == array dim, block_q))
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1, 1, block_q), lambda b_, h, iq, ik: (b_, h, 0, iq)))
        out_shape = (out_shape, jax.ShapeDtypeStruct((b, hq, 1, sq), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, iq, ik: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, iq, ik: (b_, h // groups, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, iq, ik: (b_, h // groups, ik, 0)),
            # segments carry a singleton middle axis so the block's last two
            # dims are (1 == array dim, block): Mosaic requires the last two
            # block dims be (8,128)-aligned OR equal to the array's — a
            # (1, block) spec over [B, S] fails once B > 1
            pl.BlockSpec((1, 1, block_q), lambda b_, h, iq, ik: (b_, 0, iq)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, iq, ik: (b_, 0, ik)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((d, block_q), jnp.float32),
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((1, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * sq * skv * d * (0.5 if causal else 1.0)),
            bytes_accessed=(q.size + k.size + v.size * 2) * q.dtype.itemsize,
            transcendentals=int(b * hq * sq * skv * (0.5 if causal else 1.0)),
        ),
        interpret=interpret,
    )(qT, kT, vT, qseg, kseg)
    if return_lse:
        out, lse = out
        return out.transpose(0, 2, 1, 3), lse
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Pallas flash-attention BACKWARD kernel.
#
# The reference gets its training backward from CUDA flash-attn-2
# (modeling_dreamllm.py:500-551). Here the r3 design was Pallas-forward +
# XLA-recompute backward, which sits at its HBM bandwidth roofline
# (~7.8 ms/layer at b4/s2048/h16/d128: XLA materializes the [B,H,Sq,Skv]
# score/probability tensors in HBM). This kernel replaces that with the
# standard flash backward recurrence, shaped for the TPU:
#
#   * ONE kernel, grid (batch, q_head, kv_block, q_block) with the q-block
#     axis innermost: dK/dV accumulate in fp32 VMEM scratch across q blocks
#     (written once at the last q step); dQ contributions are emitted as
#     per-kv-block fp32 partials [nk, B, H, Sq, D] and summed by one XLA
#     reduction outside — Pallas output blocks cannot be revisited
#     non-consecutively, and HBM-aliased accumulation races the DMA pipeline,
#     so partials are the safe formulation. This fuses what the two-kernel
#     (dq | dkv) reference designs split, saving a full recompute of the
#     scores and dP per block pair (2 of 7 matmuls + an exp pass).
#   * Transposed-scores layout [block_k, block_q] (the same layout that won
#     the forward): the saved LSE and the delta row broadcast along LANES,
#     and all five matmuls (S, dP, dV, dK, dQ) are direct dot_generals with
#     no materialized transposes. Unlike the forward there is NO online
#     softmax here at all — P is reconstructed exactly as exp(S - LSE) — so
#     the backward has zero cross-lane reductions; every reduction lives in
#     a matmul. Three of the five matmuls contract over the big block dim
#     (not d=128), which amortizes the MXU far better than the forward can.
#   * bf16 MXU operands + fp32 accumulation, matching flash-attn-2's
#     precision choices (P and dS are cast to the input dtype for the MXU).
#
# The forward saves (out, LSE); delta = rowsum(dO * O) is one cheap fused
# XLA pass. Set DREAMLLM_FLASH_BWD=xla to fall back to the r3
# XLA-recompute backward.
# ---------------------------------------------------------------------------


def _flash_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dqp_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    use_segments: bool,
):
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # Causal: kv blocks strictly above the diagonal contribute nothing.
    should_compute = True
    if causal:
        should_compute = ik * block_k <= iq * block_q + (block_q - 1)

    @pl.when(should_compute)
    def _compute():
        q = q_ref[0, 0]    # [bq, d] input dtype
        k = k_ref[0, 0]    # [bk, d]
        v = v_ref[0, 0]    # [bk, d]
        do = do_ref[0, 0]  # [bq, d]
        lse = lse_ref[0, 0, 0, :]      # [bq] fp32
        delta = delta_ref[0, 0, 0, :]  # [bq] fp32

        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [bk, bq]

        mask = None
        if causal:
            kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0)
            qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1)
            mask = kpos <= qpos
        if use_segments:
            qs = qseg_ref[0, 0, :]
            ks = kseg_ref[0, 0, :]
            seg = (ks[:, None] == qs[None, :]) & (qs[None, :] != 0)
            mask = seg if mask is None else (mask & seg)

        # Exact P (no running max): padded rows have lse ≈ NEG_INF so the
        # exponent is 0 there; the final where() zeroes them. Active rows
        # have lse >= row max, so the exponent never overflows.
        if mask is not None:
            e = jnp.exp(jnp.where(mask, sT, NEG_INF) - lse[None, :])
            pT = jnp.where(mask, e, 0.0)  # [bk, bq] fp32
        else:
            pT = jnp.exp(sT - lse[None, :])

        dv_acc[...] += jax.lax.dot_general(
            pT.astype(v.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, d]
        dpT = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, bq]
        dsT = (pT * (dpT - delta[None, :]) * sm_scale).astype(q.dtype)
        dk_acc[...] += jax.lax.dot_general(
            dsT, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, d]
        dqp_ref[0, 0, 0] = jax.lax.dot_general(
            dsT, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, d] fp32

    if causal:
        @pl.when(jnp.logical_not(should_compute))
        def _zero_dq():
            dqp_ref[0, 0, 0] = jnp.zeros_like(dqp_ref[0, 0, 0])

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_attention_bwd_tpu(
    q, k, v, do, out, lse, qseg, kseg,
    *,
    causal, sm_scale, block_q, block_k, interpret=False,
):
    """Run the Pallas backward. BSHD in/out; lse is [B, Hq, 1, Sq] fp32."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    groups = hq // hkv
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    assert sq % block_q == 0 and skv % block_k == 0, (sq, skv, block_q, block_k)
    nq = sq // block_q
    nk = skv // block_k

    use_segments = qseg is not None
    if not use_segments:
        qseg = jnp.zeros((b, sq), jnp.int32)
        kseg = jnp.zeros((b, skv), jnp.int32)

    # delta = rowsum(dO * O): one fused elementwise pass, [B, Hq, 1, Sq]
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.transpose(0, 2, 1)[:, :, None, :]

    qT = q.transpose(0, 2, 1, 3)
    kT = k.transpose(0, 2, 1, 3)
    vT = v.transpose(0, 2, 1, 3)
    doT = do.transpose(0, 2, 1, 3)
    qseg3 = qseg.astype(jnp.int32)[:, None, :]
    kseg3 = kseg.astype(jnp.int32)[:, None, :]

    grid = (b, hq, nk, nq)
    kernel = functools.partial(
        _flash_bwd_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        use_segments=use_segments,
    )

    dqp, dkT, dvT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, ik, iq: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, ik, iq: (b_, h // groups, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, ik, iq: (b_, h // groups, ik, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h, ik, iq: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h, ik, iq: (b_, h, 0, iq)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h, ik, iq: (b_, h, 0, iq)),
            pl.BlockSpec((1, 1, block_q), lambda b_, h, ik, iq: (b_, 0, iq)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, ik, iq: (b_, 0, ik)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, block_q, d), lambda b_, h, ik, iq: (ik, b_, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, ik, iq: (b_, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h, ik, iq: (b_, h, ik, 0)),
        ],
        out_shape=[
            # dQ partials: one slab per kv block, summed outside. fp32 so the
            # nk-way sum doesn't lose mantissa; transient (freed after the sum).
            jax.ShapeDtypeStruct((nk, b, hq, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, skv, d), k.dtype),  # per-Q-head dK
            jax.ShapeDtypeStruct((b, hq, skv, d), v.dtype),  # per-Q-head dV
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * b * hq * sq * skv * d * (0.5 if causal else 1.0)),
            bytes_accessed=(q.size * 2 + k.size * 2 + v.size * 2) * q.dtype.itemsize
            + nk * q.size * 4,
            transcendentals=int(b * hq * sq * skv * (0.5 if causal else 1.0)),
        ),
        interpret=interpret,
    )(qT, kT, vT, doT, lse, delta, qseg3, kseg3)

    dq = dqp.sum(axis=0).astype(q.dtype).transpose(0, 2, 1, 3)
    if groups > 1:
        dkT = dkT.reshape(b, hkv, groups, skv, d).astype(jnp.float32).sum(2).astype(k.dtype)
        dvT = dvT.reshape(b, hkv, groups, skv, d).astype(jnp.float32).sum(2).astype(v.dtype)
    return dq, dkT.transpose(0, 2, 1, 3), dvT.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Custom VJP: Pallas forward + Pallas backward (XLA-recompute fallback).
#
# The flash kernel isn't differentiable through pallas_call (scratch carries,
# fori accumulation); training needs grads through attention. The forward
# saves (q, k, v, out, lse); the backward runs _flash_attention_bwd_tpu.
# DREAMLLM_FLASH_BWD=xla restores the r3 recompute design: backward
# recomputes attention with the plain XLA formulation and pulls gradients
# through that (numerically equivalent, HBM-bandwidth-bound).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_core(q, k, v, qseg, kseg, causal, sm_scale, block_q, block_k, interpret):
    return _flash_attention_tpu(
        q, k, v, qseg, kseg,
        causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )


def _flash_core_fwd(q, k, v, qseg, kseg, causal, sm_scale, block_q, block_k, interpret):
    out, lse = _flash_attention_tpu(
        q, k, v, qseg, kseg,
        causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, interpret=interpret, return_lse=True,
    )
    return out, (q, k, v, qseg, kseg, out, lse)


def _bwd_block_default(seq: int, want: int) -> int:
    blk = min(want, seq)
    while blk > 128 and seq % blk != 0:
        blk //= 2
    if seq % blk != 0:
        # non-power-of-two override (e.g. DREAMLLM_FBWD_BQ=768 at seq 2048)
        # can halve past every divisor; fall back to a guaranteed one rather
        # than trip the divisibility assert mid-training
        blk = 128 if seq % 128 == 0 else seq
    return blk


def _flash_core_bwd(causal, sm_scale, block_q, block_k, interpret, residuals, g):
    q, k, v, qseg, kseg, out, lse = residuals

    if os.environ.get("DREAMLLM_FLASH_BWD", "pallas") == "xla":
        def ref(q, k, v):
            return dot_product_attention(
                q, k, v, causal=causal, segment_ids=qseg, kv_segment_ids=kseg,
                sm_scale=sm_scale,
            )

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None

    # Backward block sizes are independent of the forward's. Measured on
    # v5e at b4/s2048/h16/d128 causal (scripts/exp_attn_bwd.py, ms/layer
    # fwd+bwd): 1024/1024 → 6.50, 512/1024 → 6.54, 256/1024 → 6.56,
    # 1024/512 → 6.73, 512/512 → 7.24 — vs 12.60 for the r3 XLA-recompute
    # backward and 15.1/16.2 for the jax builtin/splash Pallas kernels.
    bq = int(os.environ.get("DREAMLLM_FBWD_BQ", "1024"))
    bk = int(os.environ.get("DREAMLLM_FBWD_BK", "1024"))
    dq, dk, dv = _flash_attention_bwd_tpu(
        q, k, v, g.astype(q.dtype), out, lse, qseg, kseg,
        causal=causal, sm_scale=sm_scale,
        block_q=_bwd_block_default(q.shape[1], bq),
        block_k=_bwd_block_default(k.shape[1], bk),
        interpret=interpret,
    )
    return dq, dk, dv, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: jnp.ndarray | None = None,
    kv_segment_ids: jnp.ndarray | None = None,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention, BSHD layout. Pallas on TPU, XLA elsewhere.

    Functional drop-in for ``dot_product_attention``; see its docstring for
    the segment-id contract (``kv_segment_ids`` alone masks padded KV: 0 =
    padding, 1 = valid). Differentiable: the backward is the fused Pallas
    kernel (_flash_bwd_kernel, 6.50 ms/layer fwd+bwd vs 12.6 for XLA
    recompute at b4/s2048/h16/d128); set ``DREAMLLM_FLASH_BWD=xla`` to fall
    back to recomputing through the XLA formulation (see _flash_core).

    Default blocks are shape-tuned on-chip: d=128 decoders run 1024x1024
    (1.30 ms/layer at 7B/2048 vs 1.43 at 256x1024 — the kernel is
    softmax/VPU-bound, so all block choices land within ~15%), d=64 UNet
    spatial attention keeps 256x1024 (measured faster at seq 4096).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    sq_, skv_ = q.shape[1], k.shape[1]
    if block_q is None:
        block_q = 256 if q.shape[-1] == 64 else 1024
        # shrink to a divisor rather than demote to the XLA fallback: seq
        # 1280/1536/2560 ran the kernel at the old 256 default and must keep
        # running it after the 1024 retune
        while block_q > 128 and sq_ % min(block_q, sq_) != 0:
            block_q //= 2
    if block_k is None:
        block_k = 1024
        while block_k > 128 and skv_ % min(block_k, skv_) != 0:
            block_k //= 2
    on_tpu = jax.default_backend() == "tpu"
    d = q.shape[-1]
    sq, skv = q.shape[1], k.shape[1]
    # Pallas path needs block-divisible lengths and a supported head dim;
    # everything else (short decode queries, odd shapes) goes through XLA.
    # head_dim 64 (UNet spatial transformers) runs natively — a large win at
    # seq>=512, since XLA materializes the [*, S, S] score tensor in HBM.
    ok = (
        (on_tpu or interpret)
        and (d % 128 == 0 or d == 64)
        and sq >= 128
        # d=64 lane-padding only pays off once the score tensor is large;
        # at seq 256 XLA's fused small-attention is faster (measured)
        and (d % 128 == 0 or sq >= 512)
        and skv >= 128  # short cross-attention KV: XLA (not tile-aligned)
        and sq % min(block_q, sq) == 0
        and skv % min(block_k, skv) == 0
        # the kernel's causal mask assumes q and kv start at the same
        # position; the XLA path right-aligns with a (skv - sq) offset, so
        # chunked-prefill-style causal calls (skv > sq) must take XLA
        and (not causal or sq == skv)
    )
    if not ok:
        return dot_product_attention(
            q,
            k,
            v,
            causal=causal,
            segment_ids=segment_ids,
            kv_segment_ids=kv_segment_ids,
            sm_scale=sm_scale,
        )
    b = q.shape[0]
    if segment_ids is not None or kv_segment_ids is not None:
        # a KV-only mask treats queries as one segment (all-ones)
        qseg = (segment_ids if segment_ids is not None
                else jnp.ones((b, sq))).astype(jnp.int32)
        kv_seg = kv_segment_ids if kv_segment_ids is not None else segment_ids
        kseg = kv_seg.astype(jnp.int32)
    else:
        # None, not dummy all-ones arrays: materialized ones would force
        # use_segments=True and pay the per-block compare/select VPU work on
        # every non-packed call (the kernel is softmax/VPU-bound)
        qseg = kseg = None
    # d=64 runs NATIVELY: Mosaic accepts a block whose last dim equals the
    # array's (64), and the unpadded kernel measures ~20% faster than
    # lane-padding to 128 (same results bit-for-bit)
    return _flash_core(
        q, k, v, qseg, kseg, causal, sm_scale,
        min(block_q, sq), min(block_k, skv), interpret,
    )
