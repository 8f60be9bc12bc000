"""Checkpoint save/restore with the LLM-vs-plugin split layout.

TPU-native equivalent of the reference's checkpoint protocol (SURVEY §5.4):
DreamLLMTrainer saves the LLM via save_pretrained and **each plugin to its
own file** (clip_vision_embedding.bin / dream_embedding.bin /
stable_diffusion_head.bin, dreamllm_trainer.py:37-118), which is what makes
stage mixing possible — stage-2 points each plugin at a different run dir
(configs/stage2/base.py:44-48). Here each top-level param subtree is its own
orbax item inside ``checkpoint-{step}/``:

    checkpoint-000100/
      llm/  clip_vision_embedding/  dream_embedding/  sd_head/
      opt_state/  meta (step, config json)

``load_params(dir, overrides={"sd_head": other_dir})`` re-points individual
plugins — the stage-mix workflow — replacing reset_plugins_init_kwargs
(dreamllm_trainer.py:120-134). Orbax handles sharded arrays natively, which
replaces the FSDP full-state-dict consolidation dance (fsdp_utils.py:23-61).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"checkpoint-{step:06d}")


def save_checkpoint(
    root: str,
    step: int,
    params: dict,
    opt_state: Any = None,
    extra_meta: dict | None = None,
    host_state: dict | None = None,
) -> str:
    """Write checkpoint-{step}/ with one orbax item per param subtree.

    ``host_state``: JSON-serializable host-side training state (host RNG key,
    data-stream position/state) — the equivalent of the reference's RNG-state
    + ``skip_first_batches`` resume data (trainer.py:698-757).

    Atomicity: everything writes into ``<path>.tmp`` and renames into place
    at the end — a crash mid-save leaves only a .tmp dir, never a
    checkpoint-NNN that :func:`latest_checkpoint` would pick up half-written
    (the normal preemption failure mode on TPU pods).
    """
    path = _ckpt_dir(root, step)
    tmp = path + ".tmp"
    main = jax.process_index() == 0
    # host-side filesystem work is process-0-only on a shared filesystem:
    # unsynchronized rmtree/json writes from every host race each other and
    # the rename (orbax itself coordinates its collective saves internally)
    if main and os.path.isdir(tmp):
        import shutil

        shutil.rmtree(tmp)  # leftover from a previous crashed save
    _barrier("ckpt_tmp_clean")
    ckpt = ocp.PyTreeCheckpointer()
    for name, subtree in params.items():
        ckpt.save(os.path.join(tmp, name), subtree)
    if opt_state is not None:
        ckpt.save(os.path.join(tmp, "opt_state"), opt_state)
    if main:
        meta = {"step": step, "param_groups": sorted(params.keys())}
        if extra_meta:
            meta.update(extra_meta)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        if host_state is not None:
            with open(os.path.join(tmp, "host_state.json"), "w") as f:
                json.dump(host_state, f)
    # every host must be done writing into tmp before the rename
    _barrier("ckpt_pre_rename")
    if main:
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)  # re-saving the same step
        os.replace(tmp, path)
    _barrier("ckpt_post_rename")
    return path


def _barrier(name: str) -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def load_host_state(path: str) -> dict | None:
    """Host-side resume state saved alongside the checkpoint (or None for
    checkpoints written without it)."""
    p = os.path.join(path, "host_state.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def latest_checkpoint(root: str) -> str | None:
    """Most recent checkpoint-* under root (the reference auto-resumes the
    same way, projects/dreamllm/train.py:206-209)."""
    if not os.path.isdir(root):
        return None
    best, best_step = None, -1
    for name in os.listdir(root):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if not m or int(m.group(1)) <= best_step:
            continue
        cand = os.path.join(root, name)
        # a dir without meta.json is an incomplete save (pre-atomic-rename
        # layouts / foreign dirs): never resume from it
        if not os.path.exists(os.path.join(cand, "meta.json")):
            continue
        best, best_step = cand, int(m.group(1))
    return best


def load_params(
    path: str,
    like: dict | None = None,
    overrides: dict[str, str] | None = None,
) -> dict:
    """Restore the param dict from a checkpoint dir.

    ``like``: optional template pytree — restores with matching shardings/
    dtypes (pass the abstract or concrete target tree).
    ``overrides``: plugin name → OTHER checkpoint dir; that subtree loads
    from there instead (stage mixing).
    """
    path = os.path.abspath(path)  # orbax rejects relative paths
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    ckpt = ocp.PyTreeCheckpointer()
    out = {}
    for name in meta["param_groups"]:
        base = os.path.abspath((overrides or {}).get(name, path))
        src = os.path.join(base, name)
        if like is not None and name in like:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like[name])
            out[name] = ckpt.restore(src, args=ocp.args.PyTreeRestore(target))
        else:
            out[name] = _rebuild_quantized(ckpt.restore(src))
    return out


def _rebuild_quantized(tree):
    """Orbax restores registered dataclasses as plain dicts when no template
    is given; rebuild QTensor/Q4Tensor/LoRATensor nodes (their key sets are
    unambiguous) so quantized / adapter-attached checkpoints flow straight
    into qmm's isinstance dispatch."""
    from dreamllm_tpu.ops.quant import LoRATensor, QTensor
    from dreamllm_tpu.ops.quant4 import Q4Tensor

    if isinstance(tree, dict):
        keys = set(tree.keys())
        if keys == {"q", "scale"}:
            return QTensor(q=tree["q"], scale=tree["scale"])
        if keys == {"packed", "scale"}:
            return Q4Tensor(packed=tree["packed"], scale=tree["scale"])
        if keys == {"base", "a", "b", "scale"}:
            return LoRATensor(
                base=_rebuild_quantized(tree["base"]),
                a=tree["a"], b=tree["b"], scale=tree["scale"],
            )
        return {k: _rebuild_quantized(v) for k, v in tree.items()}
    return tree


def load_opt_state(path: str, like: Any = None) -> Any:
    ckpt = ocp.PyTreeCheckpointer()
    src = os.path.join(os.path.abspath(path), "opt_state")
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        try:
            out = ckpt.restore(src, args=ocp.args.PyTreeRestore(target))
        except Exception:
            out = ckpt.restore(src)
        # layout migration: 8-bit moment codes used to be stored flat
        # int8 [padded_n]; they are now block-shaped [n_blocks, 256]
        # (train/optim8bit.py _Moment). Orbax restores the SAVED shapes
        # even with a target, so reshape element-count-preserving
        # mismatches onto the template layout here.
        like_shapes = [getattr(l, "shape", None) for l in jax.tree.leaves(like)]
        out_shapes = [getattr(l, "shape", None) for l in jax.tree.leaves(out)]
        if like_shapes != out_shapes:
            out = _migrate_opt_state(out, like)
        return out
    return ckpt.restore(src)


def _migrate_opt_state(raw: Any, like: Any) -> Any:
    """Fit a restored opt-state onto ``like``'s tree across layout changes.

    Handled migrations (structural walk of ``like`` with ``raw`` in step;
    orbax's bare restore renders NamedTuples as dicts keyed by field name):

      * element-count-preserving reshape (flat→block int8 moment codes);
      * 8-bit ``_Moment(codes, scale)`` → fp32 moment array (dequantize) —
        an opt-state saved before a leaf moved under ``min_8bit_size`` /
        ``fp32_moment_paths`` resumes against the new fp32 layout;
      * fp32 moment array → ``_Moment`` (re-quantize) — the reverse config
        change. v moments live in sqrt code space; the walk tracks which
        Adam8bitState field it is under so both directions use the right
        transform (train/optim8bit.py quant/dequant_moment_{m,v}).

    Every leaf pairing is verified by element count + dtype before use."""
    from dreamllm_tpu.train import optim8bit as o8

    def fit(a, l):
        a = jnp.asarray(a)
        if a.shape != l.shape:
            if a.size != l.size:
                raise ValueError(
                    f"cannot migrate opt-state leaf {a.shape}->{l.shape}: "
                    "element counts differ"
                )
            a = a.reshape(l.shape)
        if a.dtype != l.dtype:
            raise ValueError(
                f"cannot migrate opt-state leaf: dtype {a.dtype} != {l.dtype}"
            )
        sharding = getattr(l, "sharding", None)
        return jax.device_put(a, sharding) if sharding is not None else a

    def as_moment(r):
        if isinstance(r, o8._Moment):
            return r
        if isinstance(r, dict) and set(r) == {"codes", "scale"}:
            codes = jnp.asarray(r["codes"])
            return o8._Moment(codes.reshape(-1, o8.BLOCK),
                              jnp.asarray(r["scale"]).reshape(-1))
        return None

    def raw_child(r, name, idx):
        if isinstance(r, dict):
            if name in r:
                return r[name]
            if str(idx) in r:  # orbax renders plain tuples as '0','1',... keys
                return r[str(idx)]
            raise ValueError(f"opt-state migration: no saved entry for {name!r}")
        return r[idx]

    def walk(l, r, vspace):
        mom = as_moment(r)
        if isinstance(l, o8._Moment):
            if mom is not None:
                return o8._Moment(fit(mom.codes, l.codes), fit(mom.scale, l.scale))
            # fp32 moment saved, 8-bit expected now: re-quantize
            a = jnp.asarray(r).astype(jnp.float32)
            q = o8.quant_moment_v(a) if vspace else o8.quant_moment_m(a)
            return o8._Moment(fit(q.codes, l.codes), fit(q.scale, l.scale))
        if hasattr(l, "_fields"):  # NamedTuple (optax states, Adam8bitState)
            is_adam8 = isinstance(l, o8.Adam8bitState)
            vals = [
                walk(getattr(l, name),
                     raw_child(r, name, i),
                     (name == "v") if is_adam8 else vspace)
                for i, name in enumerate(l._fields)
            ]
            return type(l)(*vals)
        if isinstance(l, dict):
            return {k: walk(v, raw_child(r, k, i), vspace)
                    for i, (k, v) in enumerate(l.items())}
        if isinstance(l, (list, tuple)):
            return type(l)(walk(v, raw_child(r, None, i), vspace)
                           for i, v in enumerate(l))
        # leaf expected
        if mom is not None:
            # 8-bit moment saved, fp32 expected now: dequantize
            deq = (o8.dequant_moment_v if vspace else o8.dequant_moment_m)(
                mom, l.shape)
            return fit(deq.astype(l.dtype), l)
        return fit(r, l)

    return walk(like, raw, False)


def checkpoint_step(path: str) -> int:
    with open(os.path.join(path, "meta.json")) as f:
        return int(json.load(f)["step"])
