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
        w = layers[t]  # [L, in, out]
        L, din, dout = w.shape
        a = jax.random.normal(k, (L, din, cfg.rank), jnp.float32) * (din**-0.5)
        out[t] = {
            "a": a.astype(w.dtype),
            "b": jnp.zeros((L, cfg.rank, dout), w.dtype),
        }
    return {"layers": out}


def apply_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Merge: W' = W + a@b·scale. Returns a new params tree (base unchanged)."""
    new_layers = dict(params["layers"])
    for t, f in lora["layers"].items():
        delta = jnp.einsum("lir,lro->lio", f["a"].astype(jnp.float32),
                           f["b"].astype(jnp.float32)) * cfg.scale
        new_layers[t] = (params["layers"][t].astype(jnp.float32) + delta).astype(
            params["layers"][t].dtype
        )
    return {**params, "layers": new_layers}


def lora_loss_fn(base_params: dict, lora_cfg: LoRAConfig, loss_fn):
    """Wrap a ``loss_fn(params, batch, rng)`` so it differentiates only the
    LoRA factors: base params are closed over (frozen by construction)."""

    def fn(lora, batch, rng):
        merged = apply_lora(base_params, lora, lora_cfg)
        return loss_fn(merged, batch, rng)

    return fn
