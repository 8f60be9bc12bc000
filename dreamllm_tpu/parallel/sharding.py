"""NamedSharding rules for the DreamLLM param pytree.

The TPU-native replacement for the reference's three parallelism engines
(FSDP/DeepSpeed/DDP, SURVEY §2.8): a path-regex → PartitionSpec table, like
the reference's ``fsdp_transformer_layer_cls_to_wrap`` but at tensor
granularity. Frozen plugins don't need an "ignored modules" protocol
(trainer.py:279-283) — they simply get replicated (or sharded) specs like
any other subtree, and the optimizer mask (models/dreamllm.py
param_freeze_mask) keeps them out of the update.

Conventions (weights are [in, out]; scan-stacked layers have a leading L):
  * attention/MLP in-projections  [.., H_in, H_out] → P(..., "fsdp", "tp")
  * out-projections               [.., H_in, H_out] → P(..., "tp", "fsdp")
  * embeddings [V, H] → P("tp", "fsdp"); lm_head [H, V] → P("fsdp", "tp")
  * conv kernels HWIO → shard O on "fsdp"
  * everything 1D (norms, biases) replicated
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, spec builder given leading-L flag)
_LLM_RULES: list[tuple[str, P]] = [
    (r"embed_tokens$", P("tp", "fsdp")),
    (r"lm_head$", P("fsdp", "tp")),
    # fused serving layouts (fuse_llama_params) are in-projections too —
    # without these rules the LARGEST weights fell to the rank fallback and
    # replicated across "tp"
    (r"layers/(wq|wk|wv|w_gate|w_up|wqkv|w_gate_up)$", P(None, "fsdp", "tp")),
    (r"layers/(wo|w_down)$", P(None, "tp", "fsdp")),
    (r"layers/.*norm$", P(None, None)),
    (r"final_norm$", P(None)),
]

_GENERIC_RULES: list[tuple[str, P]] = [
    # CLIP scan-stacked linears [L, in, out]
    (r"clip/layers/(wq|wk|wv|fc1_w)$", P(None, "fsdp", "tp")),
    (r"clip/layers/(wo|fc2_w)$", P(None, "tp", "fsdp")),
    (r"clip/patch_embedding$", P(None, None, None, "fsdp")),
    # projector / generic dense [in, out]
    (r"(projector|proj).*/w$", P("fsdp", None)),
    # UNet/VAE conv kernels HWIO
    (r"/w$", None),  # handled by ndim below
]


def _spec_for(path: str, ndim: int) -> P:
    for pat, spec in _LLM_RULES + _GENERIC_RULES:
        if re.search(pat, path) and spec is not None:
            if len(spec) == ndim:
                return spec
    # fallback by rank: shard the last (output/feature) dim on fsdp for
    # big tensors, replicate small ones
    if ndim >= 2:
        return P(*([None] * (ndim - 1) + ["fsdp"]))
    return P()


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}" if prefix else str(k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_paths(v, f"{prefix}/{i}")
    else:
        yield prefix, tree


def param_shardings(params, mesh: Mesh, *, min_shard_size: int = 2**14):
    """PartitionSpec pytree matching ``params``.

    Tensors smaller than ``min_shard_size`` elements are replicated — the
    all-gather latency isn't worth the HBM savings.
    """
    specs = {}
    for path, leaf in _tree_paths(params):
        if leaf.size < min_shard_size:
            specs[path] = P()
            continue
        spec = _spec_for(path, leaf.ndim)
        # drop axes that don't divide evenly
        fixed = []
        for dim, ax in enumerate(spec):
            if ax is None:
                fixed.append(None)
            else:
                n = mesh.shape[ax]
                fixed.append(ax if leaf.shape[dim] % n == 0 else None)
        fixed += [None] * (leaf.ndim - len(fixed))
        specs[path] = P(*fixed)

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: rebuild(v, f"{prefix}/{k}" if prefix else str(k)) for k, v in tree.items()
            }
        if isinstance(tree, (list, tuple)):
            return type(tree)(rebuild(v, f"{prefix}/{i}") for i, v in enumerate(tree))
        return NamedSharding(mesh, specs[prefix])

    return rebuild(params)


def batch_shardings(batch, mesh: Mesh):
    """Shard the leading (batch) dim over (data, fsdp); replicate the rest."""
    def one(leaf):
        spec = P(("data", "fsdp"), *([None] * (leaf.ndim - 1)))
        if leaf.ndim == 0 or leaf.shape[0] % (mesh.shape["data"] * mesh.shape["fsdp"]) != 0:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(one, batch)


def shard_params(params, mesh: Mesh):
    """Device-put params with their computed shardings."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)
