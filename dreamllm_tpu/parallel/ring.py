"""Ring attention: sequence parallelism over the ICI ring.

A capability the reference does NOT have (SURVEY §2.8: "SP/CP/ring-attention
— none"; its long-context story is RoPE scaling only, capped at 2048). Here
the sequence is sharded over a mesh axis; K/V chunks rotate around the ring
with ``lax.ppermute`` while each device accumulates partial attention for its
local queries with online-softmax merging — context length scales linearly
with the number of chips, compute overlaps communication.

Layout: BSHD per shard. Causal masking is positional (absolute positions
travel with the K/V chunks), so arbitrary sequence layouts and packed
segments work unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dreamllm_tpu.ops.attention import NEG_INF, dot_product_attention


def _merge(out_a, lse_a, out_b, lse_b):
    """Combine two normalized partial attentions (flash-decoding merge)."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)[..., None]   # [B,S,H,1]
    wb = jnp.exp(lse_b - m)[..., None]
    denom = jnp.maximum(wa + wb, 1e-30)
    out = (wa * out_a.astype(jnp.float32) + wb * out_b.astype(jnp.float32)) / denom
    return out.astype(out_a.dtype), m + jnp.log(denom[..., 0])


def ring_attention_inner(
    q: jnp.ndarray,             # [B, Sq_loc, Hq, D]  (this device's queries)
    k: jnp.ndarray,             # [B, Skv_loc, Hkv, D]
    v: jnp.ndarray,
    q_positions: jnp.ndarray,   # [B, Sq_loc] absolute positions
    kv_positions: jnp.ndarray,  # [B, Skv_loc]
    *,
    axis_name: str,
    causal: bool = True,
    q_segment_ids: jnp.ndarray | None = None,   # [B, Sq_loc]
    kv_segment_ids: jnp.ndarray | None = None,  # [B, Skv_loc]
    sm_scale: float | None = None,
):
    """Call INSIDE shard_map with the sequence sharded on ``axis_name``."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    if q_segment_ids is None:
        q_segment_ids = jnp.ones(q.shape[:2], jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones(k.shape[:2], jnp.int32)

    def partial_attn(k_c, v_c, kv_pos, kv_seg):
        mask = (q_segment_ids[:, :, None] == kv_seg[:, None, :]) & (
            q_segment_ids[:, :, None] != 0
        )
        if causal:
            mask = mask & (kv_pos[:, None, :] <= q_positions[:, :, None])
        bias = jnp.where(mask, 0.0, NEG_INF)[:, None, None]  # [B,1,1,Sq,Skv]
        return dot_product_attention(
            q, k_c, v_c, bias=bias, sm_scale=sm_scale, return_lse=True
        )

    def body(carry, _):
        out, lse, k_c, v_c, kv_pos, kv_seg = carry
        o_i, lse_i = partial_attn(k_c, v_c, kv_pos, kv_seg)
        out, lse = _merge(out, lse, o_i, lse_i)
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        kv_pos = jax.lax.ppermute(kv_pos, axis_name, perm)
        kv_seg = jax.lax.ppermute(kv_seg, axis_name, perm)
        return (out, lse, k_c, v_c, kv_pos, kv_seg), None

    # fp32 accumulator through the whole ring (like flash attention's): a
    # bf16 carry would re-round the merged output on every one of the n
    # steps, drifting with ring size
    out0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full(q.shape[:2] + (q.shape[2],), NEG_INF, jnp.float32)
    (out, lse, *_), _ = jax.lax.scan(
        body, (out0, lse0, k, v, kv_positions, kv_segment_ids), None, length=n
    )
    return out.astype(q.dtype)


def ring_self_attention(
    q: jnp.ndarray,   # [B, S, H, D] GLOBAL arrays (sharded on S)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "fsdp",   # which mesh axis carries the sequence
    causal: bool = True,
    segment_ids: jnp.ndarray | None = None,
    sm_scale: float | None = None,
) -> jnp.ndarray:
    """shard_map wrapper: shards S over ``axis`` and runs the ring."""
    b, s, h, d = q.shape
    n = mesh.shape[axis]
    assert s % n == 0, (s, n)
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    seq = P(None, axis)
    spec4 = P(None, axis, None, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec4, spec4, spec4, seq, seq),
        out_specs=spec4,
        check_vma=False,
    )
    def run(q, k, v, pos, seg):
        return ring_attention_inner(
            q, k, v, pos, pos,
            axis_name=axis, causal=causal,
            q_segment_ids=seg, kv_segment_ids=seg, sm_scale=sm_scale,
        )

    return run(q, k, v, positions, segment_ids)


def ring_llama_forward(
    params,
    cfg,
    mesh: Mesh,
    *,
    input_ids: jnp.ndarray | None = None,
    inputs_embeds: jnp.ndarray | None = None,
    segment_ids: jnp.ndarray | None = None,
    positions: jnp.ndarray | None = None,
    axis: str = "fsdp",
    remat: bool | str = False,
) -> jnp.ndarray:
    """Full decoder forward with the SEQUENCE sharded over ``axis``.

    The whole scan-over-layers stack runs inside one ``shard_map``: norms and
    MLPs are token-local, attention is the ring. Params are replicated inside
    the shard_map region (XLA still shards them at rest via their
    NamedShardings; they are all-gathered into the region). Max context per
    step scales linearly with ``mesh.shape[axis]`` — the capability the
    reference lacks entirely (SURVEY §5.7: hard 2048 cap,
    modeling_dreamllm.py:1368-1371).

    Returns the final ``last_hidden_state`` [B, S, H], sharded on S.
    """
    from dreamllm_tpu.models.llama import llama_forward

    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids, axis=0)
    b, s, _ = inputs_embeds.shape
    n = mesh.shape[axis]
    assert s % n == 0, f"sequence {s} not divisible by {axis}={n}"
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    emb = P(None, axis, None)
    seq = P(None, axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), emb, seq, seq),
        out_specs=emb,
        check_vma=False,
    )
    def run(p, x, seg, pos):
        out = llama_forward(
            p, cfg,
            inputs_embeds=x, segment_ids=seg, positions=pos,
            use_flash=False, remat=remat, ring_axis=axis,
        )
        return out["last_hidden_state"]

    return run(params, inputs_embeds, segment_ids, positions)
