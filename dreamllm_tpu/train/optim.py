"""Optimizer factory + LR schedule zoo.

TPU-native equivalent of the reference's optimizer plumbing: AdamW with
weight-decay grouping that excludes norms/biases (trainer.py:381-446), the
LR-schedule zoo (utils/training_utils.py:96-417 — constant/linear/cosine/
cosine-restarts/polynomial/piecewise), ``scale_lr`` linear scaling
(trainer.py:402-413), and frozen-plugin masking (the optax.masked replacement
for requires_grad_(False) + FSDP ignored_modules).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    schedule: str = "cosine"  # constant | linear | cosine | cosine_restarts | polynomial
    warmup_steps: int = 0
    total_steps: int = 10000
    min_lr_ratio: float = 0.0
    num_cycles: float = 0.5          # cosine periods (HF convention)
    power: float = 1.0               # polynomial decay power
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0       # 0 disables clipping
    scale_lr_by: float = 1.0         # linear LR scaling factor (scale_lr)
    # int8 blockwise-quantized Adam moments (bitsandbytes Adam8bit
    # equivalent, train/optim8bit.py): ~4x optimizer-state memory reduction
    optimizer_8bit: bool = False
    # bnb parity knobs (only with optimizer_8bit): leaves smaller than
    # min_8bit_size keep fp32 moments (bnb min_8bit_size default), and any
    # param whose path contains one of fp32_moment_paths keeps fp32 moments
    # regardless of size — the reference registers exactly this override for
    # every nn.Embedding under bnb Adam8bit (trainer.py:451-463)
    min_8bit_size: int = 4096
    fp32_moment_paths: tuple = ("embed_tokens",)


def make_lr_schedule(cfg: OptimizerConfig):
    peak = cfg.learning_rate * cfg.scale_lr_by
    floor = peak * cfg.min_lr_ratio
    decay_steps = max(cfg.total_steps - cfg.warmup_steps, 1)

    if cfg.schedule == "constant":
        main = optax.constant_schedule(peak)
    elif cfg.schedule == "linear":
        main = optax.linear_schedule(peak, floor, decay_steps)
    elif cfg.schedule == "cosine":
        # HF cosine: 0.5*(1+cos(pi * 2*num_cycles * progress))
        def main(step):
            progress = jnp.clip(step / decay_steps, 0.0, 1.0)
            c = 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * cfg.num_cycles * progress))
            return floor + (peak - floor) * jnp.maximum(c, 0.0)
    elif cfg.schedule == "cosine_restarts":
        def main(step):
            progress = jnp.clip(step / decay_steps, 0.0, 1.0)
            cycle_pos = (progress * cfg.num_cycles) % 1.0
            c = 0.5 * (1.0 + jnp.cos(jnp.pi * cycle_pos))
            lr = floor + (peak - floor) * c
            # past the end, cycle_pos wraps to 0 (= full peak); HF's
            # hard-restarts schedule returns the floor for progress >= 1
            # (get_cosine_with_hard_restarts_schedule_with_warmup)
            return jnp.where(progress >= 1.0, floor, lr)
    elif cfg.schedule == "polynomial":
        def main(step):
            progress = jnp.clip(step / decay_steps, 0.0, 1.0)
            return floor + (peak - floor) * (1.0 - progress) ** cfg.power
    else:
        raise ValueError(cfg.schedule)

    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, peak, cfg.warmup_steps)
        return optax.join_schedules([warmup, main], [cfg.warmup_steps])
    return main


def _decay_mask(params) -> Any:
    """True where weight decay applies: matmul/conv/embedding weights.

    Exclusion is by param PATH, not rank — scan-stacked norm scales and
    biases are rank-2 ``[L, h]`` (llama input_norm/post_attn_norm, CLIP
    ln*/b* leaves), so ``ndim >= 2`` would wrongly decay them. Mirrors the
    reference's norm/bias exclusion (trainer.py:381-390)."""

    def decay(path, p) -> bool:
        keys = [str(getattr(k, "key", k)).strip("'\"[]").lower() for k in path]
        leaf = keys[-1] if keys else ""
        # norm scales/biases: leaf OR any parent named *norm*/ln* (GroupNorm
        # subtrees are {"norm1": {"w": ..., "b": ...}})
        if any("norm" in k or k.startswith("ln") or k.endswith("_ln") for k in keys):
            return False
        if leaf in ("b", "bias", "bq", "bk", "bv", "bo") or leaf.endswith("_b"):
            return False  # biases
        return p.ndim >= 2

    return jax.tree_util.tree_map_with_path(decay, params)


def make_optimizer(
    cfg: OptimizerConfig,
    trainable_mask: Any | None = None,
    grad_multipliers: Any | None = None,
) -> optax.GradientTransformation:
    """AdamW + clip + schedule, with optional freeze mask pytree
    (True = trainable) and optional per-layer gradient multipliers
    (see :func:`layerwise_multiplier_tree` — partial unfreeze / LLRD)."""
    schedule = make_lr_schedule(cfg)
    chain = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if cfg.optimizer_8bit:
        from dreamllm_tpu.train.optim8bit import adamw_8bit

        def _fp32_moments(params):
            paths = tuple(cfg.fp32_moment_paths or ())

            def flag(kp, _):
                key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
                return any(p in key for p in paths)

            return jax.tree_util.tree_map_with_path(flag, params)

        chain.append(
            adamw_8bit(
                learning_rate=schedule,
                b1=cfg.b1,
                b2=cfg.b2,
                eps=cfg.eps,
                weight_decay=cfg.weight_decay,
                mask=_decay_mask if cfg.weight_decay > 0 else None,
                min_8bit_size=cfg.min_8bit_size,
                fp32_moments_mask=_fp32_moments if cfg.fp32_moment_paths else None,
            )
        )
    else:
        chain.append(
            optax.adamw(
                learning_rate=schedule,
                b1=cfg.b1,
                b2=cfg.b2,
                eps=cfg.eps,
                weight_decay=cfg.weight_decay,
                mask=_decay_mask if cfg.weight_decay > 0 else None,
            )
        )
    if grad_multipliers is not None:
        # AFTER Adam, not before: Adam's mu/(sqrt(nu)+eps) is invariant to a
        # constant gradient scale, so pre-Adam scaling is a near-no-op for
        # LLRD. Scaling the UPDATE realizes per-layer LR decay exactly, and
        # a 0 multiplier freezes a layer completely (including its weight-
        # decay term, which pre-Adam scaling could not stop).
        chain.append(scale_grads_by_tree(grad_multipliers))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx


# ---------------------------------------------------------------------------
# Per-layer gradient scaling over scan-stacked params
# ---------------------------------------------------------------------------
#
# Layers live stacked on a leading L axis (models/llama.py, models/clip.py),
# so "freeze all but the last K ViT layers" (reference CLIPVisionEmbedding
# partial unfreeze, modeling_plugins.py:248-257) and "layer-wise LR decay"
# (reference llrd_utils.py / vit_llrd, trainer.py:416-434) are both a
# per-leading-index multiplier on the gradient — not an optax.masked leaf
# mask, which can't see inside one array.


def scale_grads_by_tree(multipliers: Any) -> optax.GradientTransformation:
    """Multiply each update leaf by the matching multiplier (or 1.0 if the
    multiplier tree has None there). Multipliers broadcast from the leading
    axis: shape [L] scales layer-stacked [L, ...] leaves.

    Placed AFTER the Adam transform in make_optimizer, this realizes true
    layer-wise LR scaling (pre-Adam gradient scaling cancels in
    mu/(sqrt(nu)+eps)) and a 0 multiplier freezes the layer's update
    including weight decay."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def apply(g, m):
            if m is None:
                return g
            m = jnp.asarray(m, g.dtype)
            return g * m.reshape(m.shape + (1,) * (g.ndim - m.ndim))

        return jax.tree.map(apply, updates, multipliers,
                            is_leaf=lambda x: x is None), state

    return optax.GradientTransformation(init, update)


def trailing_layers_multiplier(num_layers: int, unfreeze_last: int) -> jnp.ndarray:
    """[L] vector: 0 for frozen leading layers, 1 for the trailing K."""
    idx = jnp.arange(num_layers)
    return (idx >= num_layers - unfreeze_last).astype(jnp.float32)


def llrd_multiplier(num_layers: int, decay: float) -> jnp.ndarray:
    """[L] layer-wise LR decay: top layer 1.0, each earlier layer ×decay."""
    idx = jnp.arange(num_layers)
    return decay ** (num_layers - 1 - idx).astype(jnp.float32)


def layerwise_multiplier_tree(params: Any, rules: dict[str, jnp.ndarray]) -> Any:
    """Build a multiplier tree: ``rules`` maps slash-path prefixes to an [L]
    vector applied to every leaf under that prefix; elsewhere None."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}" if path else k) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, f"{path}/{i}") for i, v in enumerate(tree))
        for prefix, vec in rules.items():
            if path == prefix or path.startswith(prefix + "/"):
                return vec
        return None

    return walk(params, "")


# ---------------------------------------------------------------------------
# EMA (reference EMAModel, utils/training_utils.py:419+ — used by the plain
# stable_diffusion training project and `use_ema` TrainingArguments)
# ---------------------------------------------------------------------------


def ema_decay_schedule(step: jnp.ndarray, max_decay: float = 0.9999):
    """Warmup decay: min(max_decay, (1+step)/(10+step)) — diffusers EMAModel."""
    return jnp.minimum(max_decay, (1.0 + step) / (10.0 + step))


def ema_update(ema_params, params, decay):
    """ema ← decay·ema + (1-decay)·params (jit-safe, works inside the step)."""
    return jax.tree.map(
        lambda e, p: (e * decay + p.astype(e.dtype) * (1.0 - decay)).astype(e.dtype),
        ema_params, params,
    )
