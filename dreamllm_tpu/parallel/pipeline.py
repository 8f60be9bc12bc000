"""Pipeline parallelism: GPipe-style SPMD schedule over the decoder stack.

A scaling capability the reference does NOT have (SURVEY §2.8: "PP — none").
The layer-stacked decoder weights (``params['layers']``, leading dim L) are
sharded over a mesh axis: each device holds one contiguous STAGE of L/P
layers. Microbatches enter at stage 0 and rotate through the stages with
``lax.ppermute`` — the idiomatic TPU formulation (one SPMD program; XLA
overlaps the ICI permute with the next stage's compute) instead of the
per-rank send/recv processes a GPU pipeline engine would use.

Schedule: the classic GPipe fill/drain. With M microbatches and P stages the
loop runs M + P - 1 ticks; at tick t, stage p processes microbatch t - p
(devices outside the valid window compute masked garbage that is never
written — branchless, so the whole schedule jits as one ``fori_loop``).
Bubble fraction = (P-1)/(M+P-1): choose M >= P for ~50%+ efficiency, M >> P
to approach 1. Everything is differentiable (``ppermute``/``psum`` have
transposes), so ``jax.grad`` through :func:`pipeline_llama_forward` trains —
see tests/test_pipeline.py for forward AND gradient parity vs the plain
scan-over-layers forward on an 8-device mesh.

Memory: each device stores its stage's weights (L/P of the stack) plus the
replicated microbatch buffers — the weight memory win is the point (a 2-axis
``(fsdp=pipeline, tp)`` layout holds models that per-device FSDP gathering
cannot). Activations here are replicated across stages for simplicity;
shard them over ``data`` via the usual batch shardings outside.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dreamllm_tpu.ops.rope import rope_cos_sin


def pipeline_llama_forward(
    params,
    cfg,
    mesh: Mesh,
    *,
    input_ids: jnp.ndarray | None = None,
    inputs_embeds: jnp.ndarray | None = None,
    segment_ids: jnp.ndarray | None = None,
    positions: jnp.ndarray | None = None,
    axis: str = "fsdp",
    microbatches: int | None = None,
    use_flash: bool = False,
    remat: bool | str = False,
) -> jnp.ndarray:
    """Full decoder forward with the LAYER STACK sharded over ``axis``.

    Args:
      axis: mesh axis carrying the pipeline stages; ``cfg.num_hidden_layers``
        must divide evenly into ``mesh.shape[axis]`` stages.
      microbatches: how many microbatches to split the batch into (defaults
        to the stage count; batch must divide evenly).

    Returns the final ``last_hidden_state`` [B, S, H] (replicated over
    ``axis``), identical to ``llama_forward(...)["last_hidden_state"]`` up
    to float reassociation.
    """
    from dreamllm_tpu.models.llama import _decoder_layer
    from dreamllm_tpu.ops.norms import rms_norm

    n_stages = mesh.shape[axis]
    n_layers = cfg.num_hidden_layers
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible into {n_stages} stages")

    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids, axis=0)
    b, s, h = inputs_embeds.shape
    m = microbatches or n_stages
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    x_mb = inputs_embeds.reshape(m, b // m, s, h)
    seg_mb = segment_ids.reshape(m, b // m, s)
    pos_mb = positions.reshape(m, b // m, s)
    seq_len = max(s, cfg.max_position_embeddings)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    # Keep data parallelism alive INSIDE the pipeline: shard the microbatch
    # buffers' batch dim over 'data' when the mesh has one and shapes divide
    # (each data slice then runs its own fill/drain over its batch slice;
    # P() would make every data replica recompute the identical full batch —
    # ADVICE r2 #4).
    data_ax = None
    if "data" in mesh.shape and mesh.shape["data"] > 1 and axis != "data":
        if (b // m) % mesh.shape["data"] == 0:
            data_ax = "data"
    mb_spec = P(None, data_ax)

    @partial(
        shard_map,
        mesh=mesh,
        # pytree-prefix specs: stage dim of the layer stack on `axis`,
        # microbatch buffers sharded over `data` on their batch dim
        in_specs=(P(axis), mb_spec, mb_spec, mb_spec),
        out_specs=mb_spec,
        check_vma=False,
    )
    def run(layers_local, x_all, seg_all, pos_all):
        idx = jax.lax.axis_index(axis)

        def stage(x, seg, pos):
            cos, sin = rope_cos_sin(cfg.rope, pos, seq_len=seq_len)

            def step(c, layer):
                y, _ = _decoder_layer(
                    layer, c, cos, sin, cfg, seg, pos, None, None, use_flash
                )
                return y, None

            if remat:
                policy = (
                    jax.checkpoint_policies.dots_saveable
                    if remat == "dots" else None
                )
                step = jax.checkpoint(step, prevent_cse=False, policy=policy)
            y, _ = jax.lax.scan(step, x, layers_local)
            return y

        def body(t, carry):
            cur, outs = carry
            # stage p processes microbatch t - p this tick; the clip only
            # touches fill/drain ticks whose results are masked off below
            mb_id = jnp.clip(t - idx, 0, m - 1)
            x_in = jnp.where(
                idx == 0, jax.lax.dynamic_index_in_dim(x_all, mb_id, keepdims=False), cur
            )
            seg = jax.lax.dynamic_index_in_dim(seg_all, mb_id, keepdims=False)
            pos = jax.lax.dynamic_index_in_dim(pos_all, mb_id, keepdims=False)
            y = stage(x_in, seg, pos)

            out_id = t - (n_stages - 1)
            write = (idx == n_stages - 1) & (out_id >= 0)
            upd = jax.lax.dynamic_update_slice(
                outs, y[None].astype(outs.dtype), (jnp.clip(out_id, 0, m - 1), 0, 0, 0)
            )
            outs = jnp.where(write, upd, outs)
            # hand this tick's activation to the next stage (the last
            # stage's permute lands on stage 0, which ignores it)
            cur = jax.lax.ppermute(y, axis, perm)
            return cur, outs

        cur0 = jnp.zeros_like(x_all[0])
        outs0 = jnp.zeros_like(x_all)
        _, outs = jax.lax.fori_loop(0, m + n_stages - 1, body, (cur0, outs0))
        # results live on the last stage only; psum replicates them so the
        # out_spec P() is truthful (and keeps the whole fn differentiable)
        return jax.lax.psum(
            jnp.where(idx == n_stages - 1, outs, jnp.zeros_like(outs)), axis
        )

    out = run(params["layers"], x_mb, seg_mb, pos_mb)
    x = out.reshape(b, s, h)
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
