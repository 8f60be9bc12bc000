"""LLaMA/Vicuna decoder backbone — pure-functional JAX, scan-over-layers.

TPU-native re-design of the reference's decoder stack
(omni/models/dreamllm/modeling_dreamllm.py:77-1043: DreamLLMRMSNorm,
Rotary*Embedding, DreamLLMMLP, DreamLLMAttention/FlashAttention2,
DreamLLMDecoderLayer, DreamLLMModel). Differences, deliberate:

  * **Pure functions over pytrees.** ``init_llama_params(rng, cfg)`` returns a
    nested dict; ``llama_forward(params, cfg, ...)`` is jittable and
    shardable with ``NamedSharding`` — no nn.Module state, no
    ``pretraining_tp`` sliced-matmul emulation (real TP comes from pjit
    partition specs, see parallel/sharding.py).
  * **scan over layers.** All decoder layers are stacked along a leading
    ``L`` axis and executed with ``jax.lax.scan``, so 32 layers compile as
    one; remat policy applies per scan step (replaces per-layer
    ``gradient_checkpointing`` loop, reference :994-1003).
  * **Static-shape KV cache.** ``[L, B, max_len, Hkv, D]`` ring-free cache
    updated with ``lax.dynamic_update_slice``; masking is positional, so
    decode steps never recompile (replaces torch.cat cache concat :350-355).
  * **Attention**: Pallas flash attention for prefill on TPU, XLA fallback
    elsewhere / for single-token decode (replaces CUDA flash-attn-2 varlen,
    reference :403-583 — padding/packing is segment ids, not unpad/repad).

Weight layout convention: all matmul weights are stored **[in, out]** (so
``y = x @ W``), i.e. the transpose of torch's nn.Linear ``[out, in]``. The
HF checkpoint converter (convert/hf_llama.py) handles the transpose.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.ops.attention import dot_product_attention, flash_attention
from dreamllm_tpu.ops.norms import rms_norm
from dreamllm_tpu.ops.rope import RopeConfig, apply_rope, rope_cos_sin
from dreamllm_tpu.ops.activations import swiglu
from dreamllm_tpu.ops.quant import matmul as qmm

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Decoder hyperparameters (reference configuration_dreamllm.py:64-223).

    Defaults follow LLaMA/Vicuna-7B; tests use tiny values.
    """

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int | None = None  # None -> MHA
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling_type: str = "none"  # "none" | "linear" | "dynamic"
    rope_scaling_factor: float = 1.0
    tie_word_embeddings: bool = False
    dtype: Any = jnp.float32  # parameter dtype; compute follows inputs

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def rope(self) -> RopeConfig:
        return RopeConfig(
            head_dim=self.head_dim,
            base=self.rope_theta,
            scaling_type=self.rope_scaling_type,
            scaling_factor=self.rope_scaling_factor,
            max_position_embeddings=self.max_position_embeddings,
        )


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _dense(rng, shape, dtype, scale=None):
    fan_in = shape[0]
    if scale is None:
        scale = fan_in**-0.5
    return (jax.random.normal(rng, shape, jnp.float32) * scale).astype(dtype)


def init_llama_params(rng: jax.Array, cfg: LlamaConfig) -> Params:
    """Random-init parameter pytree. Layer params are stacked on axis 0."""
    h, i, d = cfg.hidden_size, cfg.intermediate_size, cfg.dtype
    hq, hkv, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim
    L = cfg.num_hidden_layers
    keys = jax.random.split(rng, 10)

    def stack(fam: int, make):
        # every weight family gets its OWN key: reusing one key made
        # wq == wk == wv and w_gate == w_up bit-identical at init — a
        # degenerate symmetry (score(i,j) == score(j,i); swiglu -> silu(z)*z)
        # the optimizer would have to break
        return jnp.stack([make(k) for k in jax.random.split(keys[3 + fam], L)])

    layers = {
        "input_norm": jnp.ones((L, h), d),
        "post_attn_norm": jnp.ones((L, h), d),
        "wq": stack(0, lambda k: _dense(k, (h, hq * hd), d)),
        "wk": stack(1, lambda k: _dense(k, (h, hkv * hd), d)),
        "wv": stack(2, lambda k: _dense(k, (h, hkv * hd), d)),
        "wo": stack(3, lambda k: _dense(k, (hq * hd, h), d)),
        "w_gate": stack(4, lambda k: _dense(k, (h, i), d)),
        "w_up": stack(5, lambda k: _dense(k, (h, i), d)),
        "w_down": stack(6, lambda k: _dense(k, (i, h), d)),
    }
    params: Params = {
        "embed_tokens": _dense(keys[1], (cfg.vocab_size, h), d, scale=0.02),
        "layers": layers,
        "final_norm": jnp.ones((h,), d),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _dense(keys[2], (h, cfg.vocab_size), d)
    return params


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> Params:
    """Static-shape cache: k/v ``[L, B, max_len, Hkv, D]`` + per-slot metadata.

    ``seg`` carries the segment id of each filled slot (0 = empty), ``pos``
    its absolute position; ``index`` is the next write offset. Masking during
    decode is derived from these, so no recompile per step.

    ``dtype=jnp.int8`` stores k/v as int8 codes with per-(slot, head) fp32
    absmax scales — halves the cache's HBM footprint and read traffic, the
    long-context serving lever (at 4k context the bf16 cache read is ~2 GB
    per decoded token on 7B). Dequantization fuses into the attention dots.
    """
    L, hkv, hd = cfg.num_hidden_layers, cfg.kv_heads, cfg.head_dim
    cache = {
        "k": jnp.zeros((L, batch, max_len, hkv, hd), dtype),
        "v": jnp.zeros((L, batch, max_len, hkv, hd), dtype),
        "seg": jnp.zeros((batch, max_len), jnp.int32),
        "pos": jnp.zeros((batch, max_len), jnp.int32),
        "index": jnp.zeros((), jnp.int32),
    }
    if dtype == jnp.int8:
        cache["k_scale"] = jnp.zeros((L, batch, max_len, hkv), jnp.float32)
        cache["v_scale"] = jnp.zeros((L, batch, max_len, hkv), jnp.float32)
    return cache


def cache_write(buf: jnp.ndarray, val: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Write ``val`` [B, s, ...] into ``buf`` [B, S, ...] at write offset
    ``idx`` — a scalar (every row writes the same slot range; one
    dynamic_update_slice) or a [B] vector (per-row offsets; scatter). The
    vector form is what continuous-batching serving needs: each slot's cache
    fills at its own rate (serve/engine.py)."""
    if idx.ndim == 0:
        return jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype), (0, idx) + (0,) * (buf.ndim - 2)
        )
    b, s = val.shape[:2]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    cols = idx[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    return buf.at[rows, cols].set(val.astype(buf.dtype))


def _kv_quantize(x: jnp.ndarray):
    """[B,S,H,D] -> (int8 codes, [B,S,H] fp32 scales): per-(slot, head) absmax."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    codes = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return codes, scale


def _kv_dequantize(codes: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (codes.astype(jnp.float32) * scale[..., None]).astype(dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _attention(
    layer: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: LlamaConfig,
    segment_ids: jnp.ndarray,
    positions: jnp.ndarray,
    cache_kv: tuple[jnp.ndarray, jnp.ndarray] | None,
    cache_meta: dict | None,
    use_flash: bool,
    ring_axis: str | None = None,
):
    """One attention block. Returns (out, (new_k, new_v) or None)."""
    b, s, h = x.shape
    hq, hkv, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

    if "wqkv" in layer:
        # fused projection (serving transform, fuse_llama_params): one matmul
        # + split instead of three kernels per layer
        qkv = qmm(x, layer["wqkv"])
        q, k, v = jnp.split(qkv, [hq * hd, (hq + hkv) * hd], axis=-1)
        q = q.reshape(b, s, hq, hd)
        k = k.reshape(b, s, hkv, hd)
        v = v.reshape(b, s, hkv, hd)
    else:
        q = qmm(x, layer["wq"]).reshape(b, s, hq, hd)
        k = qmm(x, layer["wk"]).reshape(b, s, hkv, hd)
        v = qmm(x, layer["wv"]).reshape(b, s, hkv, hd)
    q, k = apply_rope(q, k, cos, sin)

    new_cache = None
    if cache_kv is not None:
        idx = cache_meta["index"]
        if len(cache_kv) == 4:  # int8 cache: (codes_k, codes_v, scale_k, scale_v)
            ck, cv, sk, sv = cache_kv
            kq, ks_new = _kv_quantize(k)
            vq, vs_new = _kv_quantize(v)
            ck = cache_write(ck, kq, idx)
            cv = cache_write(cv, vq, idx)
            sk = cache_write(sk, ks_new, idx)
            sv = cache_write(sv, vs_new, idx)
            new_cache = (ck, cv, sk, sv)
            kd = _kv_dequantize(ck, sk, q.dtype)
            vd = _kv_dequantize(cv, sv, q.dtype)
        else:
            ck, cv = cache_kv  # [B, max_len, Hkv, D]
            ck = cache_write(ck, k, idx)
            cv = cache_write(cv, v, idx)
            new_cache = (ck, cv)
            kd = ck.astype(q.dtype)
            vd = cv.astype(q.dtype)
        # positional-causal mask over the whole cache — layer-invariant, so
        # llama_forward builds it ONCE per step and the scan body reuses it
        # (32 rebuilds/step were measurable overhead in b1 decode)
        out = dot_product_attention(q, kd, vd, bias=cache_meta["bias"])
    elif ring_axis is not None:
        # Sequence parallelism: q/k/v here are this device's sequence shard
        # (we are inside shard_map with S sharded over ``ring_axis``);
        # K/V chunks rotate around the ICI ring. Positions are absolute, so
        # causal masking is exact across shards. See parallel/ring.py.
        from dreamllm_tpu.parallel.ring import ring_attention_inner

        out = ring_attention_inner(
            q, k, v, positions, positions,
            axis_name=ring_axis, causal=True,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
        )
    elif use_flash:
        out = flash_attention(q, k, v, causal=True, segment_ids=segment_ids)
    else:
        out = dot_product_attention(q, k, v, causal=True, segment_ids=segment_ids)

    out = qmm(out.reshape(b, s, hq * hd), layer["wo"])
    return out, new_cache


def _decoder_layer(
    layer: Params,
    x: jnp.ndarray,
    cos,
    sin,
    cfg: LlamaConfig,
    segment_ids,
    positions,
    cache_kv,
    cache_meta,
    use_flash,
    ring_axis=None,
):
    """Pre-norm attn + MLP residual block (reference :586-654)."""
    attn_out, new_cache = _attention(
        layer,
        rms_norm(x, layer["input_norm"], cfg.rms_norm_eps),
        cos,
        sin,
        cfg,
        segment_ids,
        positions,
        cache_kv,
        cache_meta,
        use_flash,
        ring_axis,
    )
    x = x + attn_out
    y = rms_norm(x, layer["post_attn_norm"], cfg.rms_norm_eps)
    if "w_gate_up" in layer:
        gu = qmm(y, layer["w_gate_up"])
        gate, up = jnp.split(gu, 2, axis=-1)
        y = qmm(swiglu(gate, up), layer["w_down"])
    else:
        y = qmm(swiglu(qmm(y, layer["w_gate"]), qmm(y, layer["w_up"])), layer["w_down"])
    return x + y, new_cache


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    *,
    input_ids: jnp.ndarray | None = None,
    inputs_embeds: jnp.ndarray | None = None,
    segment_ids: jnp.ndarray | None = None,
    positions: jnp.ndarray | None = None,
    kv_cache: Params | None = None,
    use_flash: bool = True,
    remat: bool | str = False,
    output_hidden_states: bool = False,
    output_stats: bool = False,
    ring_axis: str | None = None,
    scan_unroll: int | bool = 1,
):
    """Run the decoder stack.

    Args:
      input_ids: ``[B, S]`` int32, or provide ``inputs_embeds`` ``[B, S, H]``
        (multimodal splicing happens upstream, dreamllm.py).
      segment_ids: ``[B, S]`` — 0 marks padding; distinct ids separate packed
        sequences. Defaults to all-ones.
      positions: ``[B, S]`` absolute positions for RoPE + causal masking.
        Defaults to ``arange(S)`` (+ cache index when decoding).
      kv_cache: cache pytree from :func:`init_kv_cache` — when given, k/v are
        appended at ``cache['index']`` and attention runs over the full cache.
      ring_axis: when set, this call must run INSIDE ``shard_map`` with the
        sequence dim sharded over that mesh axis and ``positions`` carrying
        absolute positions; attention runs as a ring over the axis
        (sequence parallelism — use :func:`parallel.ring.ring_llama_forward`
        for the wrapped entry point).

    Returns:
      dict with ``last_hidden_state`` ``[B, S, H]``, ``kv_cache`` (updated or
      None), and optionally ``hidden_states`` ``[L+1, B, S, H]``.
    """
    if output_stats and kv_cache is not None:
        raise ValueError(
            "output_stats is a training/monitoring feature; the decode "
            "(kv_cache) scan does not collect layer stats"
        )
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids, axis=0)
    x = inputs_embeds
    b, s, _ = x.shape

    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    if positions is None:
        start = kv_cache["index"] if kv_cache is not None else 0
        if getattr(start, "ndim", 0) == 1:
            start = start[:, None]  # per-slot write offsets (vector index)
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s)) + start

    # dynamic-NTK needs the actual attention window (static): passing
    # max_position_embeddings unconditionally made the `seq_len > max_pos`
    # trigger unreachable, silently running unscaled RoPE past the
    # pretraining context. The static bound is the cache capacity when
    # decoding, else this call's sequence length. (Divergence from HF noted:
    # HF rescales only once the RUNNING length crosses max_pos; static
    # shapes scale from the start when the allocated window exceeds it.)
    window = kv_cache["k"].shape[2] if kv_cache is not None else s
    cos, sin = rope_cos_sin(
        cfg.rope, positions, seq_len=max(window, cfg.max_position_embeddings)
    )

    cache_meta = None
    if kv_cache is not None:
        # metadata update is layer-independent: do it once
        idx = kv_cache["index"]
        seg = cache_write(kv_cache["seg"], segment_ids, idx)
        pos = cache_write(kv_cache["pos"], positions, idx)
        # attention mask over the cache: kv_pos <= q_pos, same nonzero
        # segment; empty slots carry seg 0 -> masked
        bias = jnp.where(
            (pos[:, None, :] <= positions[:, :, None])
            & (seg[:, None, :] == segment_ids[:, :, None])
            & (segment_ids[:, :, None] != 0),
            0.0,
            -1e30,
        )[:, None, None]  # [B,1,1,S,max_len]
        cache_meta = {"seg": seg, "pos": pos, "index": idx, "bias": bias}

    quantized_cache = kv_cache is not None and "k_scale" in kv_cache

    def step(carry, scanned):
        x = carry
        if kv_cache is not None:
            layer, *ckv = scanned  # (k, v) or (k, v, k_scale, v_scale)
            y, new_ckv = _decoder_layer(
                layer, x, cos, sin, cfg, segment_ids, positions, tuple(ckv),
                cache_meta, use_flash
            )
            return y, (new_ckv, x if output_hidden_states else None)
        layer = scanned
        y, _ = _decoder_layer(
            layer, x, cos, sin, cfg, segment_ids, positions, None, None, use_flash,
            ring_axis,
        )
        ys = x if output_hidden_states else None
        if output_stats:
            # per-layer activation abs-max (reference log_hidden_states,
            # modeling_dreamllm.py:989-990,1019-1022 — wandb layer monitors)
            ys = (ys, jnp.max(jnp.abs(y)).astype(jnp.float32))
        return y, ys

    save_all_layers = 0
    if remat:
        # remat=True (or "full"): save nothing, recompute the whole layer in
        # backward — minimum memory, backward matmul work ~4/3 of no-remat.
        # remat="dots": save every dot output (q/k/v/o, gate/up/down) and
        # recompute only elementwise + the flash kernel — removes the matmul
        # recompute entirely for ~2·(5H+2I)·B·S·L bytes of stacked residuals.
        # remat=<int k>: partial checkpointing — the first L-k layers use the
        # "dots" policy and the last k save everything (no recompute at all);
        # spends whatever HBM is left over on skipping recompute, layer by
        # layer, where all-or-nothing remat=False does not fit (measured: the
        # 0.94B b4x2048 train step is compile-OOM on 16 GB without remat).
        # Replaces the reference's all-or-nothing gradient_checkpointing
        # (modeling_dreamllm.py:994-1003) with a policy knob.
        if remat == "dots":
            policy = jax.checkpoint_policies.dots_saveable
        elif remat is True or remat == "full":
            policy = None
        elif isinstance(remat, int) and not isinstance(remat, bool):
            if not 0 <= remat <= cfg.num_hidden_layers:
                raise ValueError(f"remat={remat} out of [0, L] range")
            save_all_layers = remat
            policy = jax.checkpoint_policies.dots_saveable
        else:
            raise ValueError(f"unknown remat policy: {remat!r}")
        step_nockpt = step
        step = jax.checkpoint(step, prevent_cse=False, policy=policy)

    if kv_cache is not None:
        if quantized_cache:
            xs = (params["layers"], kv_cache["k"], kv_cache["v"],
                  kv_cache["k_scale"], kv_cache["v_scale"])
        else:
            xs = (params["layers"], kv_cache["k"], kv_cache["v"])
        x, (new_ckv, hs) = jax.lax.scan(step, x, xs)
        new_cache = {
            "k": new_ckv[0],
            "v": new_ckv[1],
            "seg": cache_meta["seg"],
            "pos": cache_meta["pos"],
            "index": kv_cache["index"] + s,
        }
        if quantized_cache:
            new_cache["k_scale"] = new_ckv[2]
            new_cache["v_scale"] = new_ckv[3]
    elif save_all_layers:
        split = cfg.num_hidden_layers - save_all_layers
        head_stack = jax.tree.map(lambda a: a[:split], params["layers"])
        tail_stack = jax.tree.map(lambda a: a[split:], params["layers"])
        x, hs_a = jax.lax.scan(step, x, head_stack, unroll=scan_unroll)
        x, hs_b = jax.lax.scan(step_nockpt, x, tail_stack, unroll=scan_unroll)
        # None entries (hidden_states/stats off) are empty pytree nodes, so
        # tree.map concatenates only the materialized outputs
        hs = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), hs_a, hs_b)
        new_cache = None
    else:
        # scan_unroll=True (full unroll) removes the per-iteration dynamic
        # slicing of the stacked [L, ...] params and lets XLA schedule across
        # layer boundaries: measured 623 vs 644 ms/step on the v5e train
        # bench (b4x2048, 0.94B, remat="dots"). Partial unroll (4) measured
        # WORSE (708 ms); use 1 (default, fastest compile) or True.
        x, hs = jax.lax.scan(step, x, params["layers"], unroll=scan_unroll)
        new_cache = None

    stats = None
    if kv_cache is None and output_stats:
        hs, stats = hs

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)

    out = {"last_hidden_state": x, "kv_cache": new_cache}
    if output_hidden_states:
        out["hidden_states"] = jnp.concatenate([hs, x[None]], axis=0)
    if stats is not None:
        out["layer_absmax"] = stats  # [L]
    return out


def fuse_llama_params(params: Params) -> Params:
    """Serving transform: concatenate q/k/v and gate/up projections so each
    decoder layer runs 2 fewer matmul kernels (better MXU utilization at small
    batch). Composes with int8 quantization (quantize AFTER fusing)."""
    layers = dict(params["layers"])
    wqkv = jnp.concatenate([layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1)
    w_gate_up = jnp.concatenate([layers.pop("w_gate"), layers.pop("w_up")], axis=-1)
    layers["wqkv"] = wqkv
    layers["w_gate_up"] = w_gate_up
    return {**params, "layers": layers}


def llama_logits(params: Params, cfg: LlamaConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """LM head in fp32 (reference casts logits to float, :1452)."""
    from dreamllm_tpu.ops.quant import QTensor
    from dreamllm_tpu.ops.quant4 import Q4Tensor

    w = params.get("lm_head")
    if w is None:
        w = params["embed_tokens"].T
    if isinstance(w, Q4Tensor):
        # fp32 activations in -> fp32 logits out of the kernel's fp32
        # accumulator (bf16 hidden would round the 32000-wide logits through
        # bf16 and can flip greedy argmax on near-ties; int8 path matches)
        return qmm(hidden.astype(jnp.float32), w)
    if isinstance(w, QTensor):
        return qmm(hidden.astype(jnp.float32), w)
    # bf16 operands + fp32 accumulation: casting the [H, V] head to fp32
    # would double its HBM read (and can materialize a 1 GB copy) on every
    # decode step; preferred_element_type keeps logits fp32 without that.
    # dot_general requires matching operand dtypes — mixed callers (fp32
    # embeds over bf16 params) upcast the head, matching the old behavior.
    if w.dtype != hidden.dtype:
        w = w.astype(hidden.dtype)
    return jax.lax.dot_general(
        hidden, w, (((hidden.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
