"""LoRA adapters for the decoder (reference omni/utils/lora_utils.py — peft
helpers for attention/MLP matrices).

Functional formulation: a LoRA tree mirrors the stacked-layer layout of
``params["layers"]`` with low-rank factors per target matrix:

    lora["layers"]["wq"] = {"a": [L, in, r], "b": [L, r, out]}

``apply_lora(params, lora, scale)`` returns params with ``W + a@b·(alpha/r)``
merged — usable for inference or as input to a forward pass;
``lora_train_step`` style usage keeps base params frozen and differentiates
only the factors (the optimizer mask falls out of the pytree split, no
requires_grad bookkeeping).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


DEFAULT_TARGETS = ("wq", "wk", "wv", "wo")


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0
    targets: tuple[str, ...] = DEFAULT_TARGETS  # keys in params["layers"]

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def init_lora_params(rng: jax.Array, params: dict, cfg: LoRAConfig) -> dict:
    """Zero-initialized-b LoRA factors for each target matrix (so the initial
    delta is 0, standard LoRA init)."""
    layers = params["layers"]
    out = {}
    keys = jax.random.split(rng, len(cfg.targets))
    for k, t in zip(keys, cfg.targets):
        w = layers[t]  # [L, in, out] — raw array OR QTensor/Q4Tensor (QLoRA)
        L, din, dout = w.shape
        # factors train in a float dtype even over an int-quantized base
        dt = w.dtype if jnp.issubdtype(w.dtype, jnp.floating) else jnp.float32
        a = jax.random.normal(k, (L, din, cfg.rank), jnp.float32) * (din**-0.5)
        out[t] = {
            "a": a.astype(dt),
            "b": jnp.zeros((L, cfg.rank, dout), dt),
        }
    return {"layers": out}


def apply_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Merge: W' = W + a@b·scale. Returns a new params tree (base unchanged).

    Requires a FLOAT base — merging into int8/int4 weights would dequantize
    them; use :func:`attach_lora` (unmerged) for quantized bases."""
    for t in lora["layers"]:
        if not isinstance(params["layers"][t], jnp.ndarray):
            raise TypeError(
                f"apply_lora cannot merge into quantized weight {t!r} "
                f"({type(params['layers'][t]).__name__}); use attach_lora / "
                "qlora_loss_fn for a quantized base"
            )
    new_layers = dict(params["layers"])
    for t, f in lora["layers"].items():
        delta = jnp.einsum("lir,lro->lio", f["a"].astype(jnp.float32),
                           f["b"].astype(jnp.float32)) * cfg.scale
        new_layers[t] = (params["layers"][t].astype(jnp.float32) + delta).astype(
            params["layers"][t].dtype
        )
    return {**params, "layers": new_layers}


def attach_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Wrap each target weight in a :class:`~dreamllm_tpu.ops.quant.
    LoRATensor` — the adapter stays UNMERGED and the forward computes
    ``x @ base + (x @ a) @ b · scale`` at every projection (ops/quant.
    matmul dispatch). Unlike :func:`apply_lora` this works over a
    QUANTIZED base (QTensor/Q4Tensor): the QLoRA formulation — the frozen
    base keeps its int8/int4 HBM footprint and the merged bf16 weight is
    never materialized."""
    from dreamllm_tpu.ops.quant import LoRATensor

    new_layers = dict(params["layers"])
    for t, f in lora["layers"].items():
        # scale is a data leaf (it must survive orbax round-trips); for
        # stacked [L, ...] factors it carries the layer axis so the
        # decoder's scan-over-layers can slice it alongside base/a/b
        scale = jnp.full(f["a"].shape[:-2], cfg.scale, jnp.float32)
        new_layers[t] = LoRATensor(
            base=params["layers"][t], a=f["a"], b=f["b"], scale=scale
        )
    return {**params, "layers": new_layers}


def lora_loss_fn(base_params: dict, lora_cfg: LoRAConfig, loss_fn,
                 merge: bool = True):
    """Wrap a ``loss_fn(params, batch, rng)`` so it differentiates only the
    LoRA factors: base params are closed over (frozen by construction).

    ``merge=False`` uses :func:`attach_lora` instead of materializing the
    merged weights — cheaper in memory either way (the rank-r path adds two
    thin matmuls per projection instead of a full-size weight copy). A
    quantized base (QLoRA) auto-selects attach regardless of ``merge``."""
    quantized = any(
        not isinstance(base_params["layers"][t], jnp.ndarray)
        for t in lora_cfg.targets if t in base_params["layers"]
    )

    def fn(lora, batch, rng):
        combine = apply_lora if (merge and not quantized) else attach_lora
        return loss_fn(combine(base_params, lora, lora_cfg), batch, rng)

    return fn


def qlora_loss_fn(quantized_base: dict, lora_cfg: LoRAConfig, loss_fn):
    """QLoRA: differentiate LoRA factors over a frozen int8/int4 base
    (``ops.quant.quantize_llama_params`` / int4 variant). Equivalent to
    ``lora_loss_fn(..., merge=False)`` — named for discoverability."""
    return lora_loss_fn(quantized_base, lora_cfg, loss_fn, merge=False)
