"""First-inf/nan locator for divergence debugging.

TPU-native equivalent of the reference's ``DebugUnderflowOverflow`` hookup
(reference omni/train/trainer.py:519-528 wraps HF's module-level forward
hooks): when a run's loss goes NaN or the per-layer absmax channel
(``log_hidden_states``) spikes, this pinpoints WHICH module first produced
a non-finite or saturating activation — without per-module Python hooks
(impossible under jit) and without retraining.

Design: one diagnostic forward with ``output_hidden_states=True`` (every
decoder layer's input + final output), plus the embedding/splice stages, all
reduced on device to tiny per-module stat rows (abs-max, abs-min>0, finite
mask) and scanned on host in module order. The diagnostic forward is NOT the
training step (no remat, no loss) — it answers "where does it first break
on THIS batch with THESE params", the same question the reference tool
answers, as a post-mortem instead of a standing hook.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass
class ModuleStat:
    name: str
    abs_max: float
    abs_min_nonzero: float
    n_inf: int
    n_nan: int

    @property
    def finite(self) -> bool:
        return self.n_inf == 0 and self.n_nan == 0


def _stat_row(x: jnp.ndarray) -> jnp.ndarray:
    """[abs_max, abs_min_nonzero, n_inf, n_nan] — computed on device so only
    4 scalars per module cross to host."""
    xf = x.astype(jnp.float32)
    ax = jnp.abs(xf)
    nonzero = jnp.where(ax > 0, ax, jnp.inf)
    return jnp.stack([
        jnp.max(ax),
        jnp.min(nonzero),
        jnp.sum(jnp.isinf(xf)).astype(jnp.float32),
        jnp.sum(jnp.isnan(xf)).astype(jnp.float32),
    ])


def _rows_to_stats(names, rows) -> list[ModuleStat]:
    rows = np.asarray(rows)
    out = []
    for name, r in zip(names, rows):
        amin = float(r[1])
        out.append(ModuleStat(name, float(r[0]),
                              0.0 if np.isinf(amin) else amin,
                              int(r[2]), int(r[3])))
    return out


def locate_overflow(
    params: Params,
    cfg,                       # DreamLLMConfig
    batch: dict,
    *,
    saturate_at: float | None = None,  # e.g. 65504 * 0.9 for fp16-era parity
) -> dict:
    """Run one diagnostic multimodal forward and return
    ``{"stats": [ModuleStat...], "first_nonfinite": name|None,
    "first_saturating": name|None}`` in forward order.

    ``batch`` uses the training-batch layout (input_ids [+ images /
    image_positions / dream_positions]).
    """
    from dreamllm_tpu.models.dreamllm import multimodal_embed
    from dreamllm_tpu.models.llama import llama_forward, llama_logits

    llm = cfg.llm

    has_images = (batch.get("images") is not None
                  and batch.get("image_positions") is not None)
    # module names in forward order — mirrors diag()'s row order exactly
    # (the row list is trace-time static, so the two cannot skew at runtime)
    names = ["embed_tokens"]
    if has_images:
        names.append("clip_vision_embedding+projector")
    names.append("multimodal_splice")
    names += [f"decoder_layer_{li}" for li in range(llm.num_hidden_layers)]
    names += ["final_norm", "lm_head"]

    @jax.jit
    def diag(params, batch):
        rows = []
        ids = batch["input_ids"]
        embeds = jnp.take(params["llm"]["embed_tokens"], ids, axis=0)
        rows.append(_stat_row(embeds))
        if has_images:
            from dreamllm_tpu.models.dreamllm import encode_images

            b, m = batch["images"].shape[:2]
            feats = encode_images(
                params, cfg, batch["images"].reshape((b * m,) + batch["images"].shape[2:])
            )
            rows.append(_stat_row(feats))
        spliced = multimodal_embed(
            params, cfg, ids,
            images=batch.get("images"),
            image_positions=batch.get("image_positions"),
            dream_positions=batch.get("dream_positions"),
        )
        rows.append(_stat_row(spliced))
        out = llama_forward(
            params["llm"], llm, inputs_embeds=spliced,
            segment_ids=batch.get("segment_ids"),
            positions=batch.get("positions"),
            output_hidden_states=True, use_flash=False,
        )
        hs = out["hidden_states"]  # [L+1, B, S, H]: each layer's INPUT + final
        for li in range(llm.num_hidden_layers):
            rows.append(_stat_row(hs[li + 1]))
        rows.append(_stat_row(out["last_hidden_state"]))
        logits = llama_logits(params["llm"], llm, out["last_hidden_state"][:, -1:])
        rows.append(_stat_row(logits))
        return jnp.stack(rows)

    rows = diag(params, batch)
    stats = _rows_to_stats(names, rows)
    first_nonfinite = next((s.name for s in stats if not s.finite), None)
    first_saturating = None
    if saturate_at is not None:
        first_saturating = next(
            (s.name for s in stats if s.abs_max >= saturate_at), None)
    return {
        "stats": stats,
        "first_nonfinite": first_nonfinite,
        "first_saturating": first_saturating,
    }


def format_report(result: dict, top: int = 8) -> str:
    """Human-readable table, loudest modules first (the reference tool's
    frame dump, minus the per-weight rows)."""
    lines = ["module                                abs_max      abs_min>0   inf   nan"]
    for s in sorted(result["stats"], key=lambda s: -s.abs_max)[:top]:
        lines.append(f"{s.name:<36} {s.abs_max:>12.4e} {s.abs_min_nonzero:>12.4e} "
                     f"{s.n_inf:>5d} {s.n_nan:>5d}")
    lines.append(f"first non-finite module: {result['first_nonfinite'] or '-'}")
    if result["first_saturating"] is not None:
        lines.append(f"first saturating module: {result['first_saturating']}")
    return "\n".join(lines)
