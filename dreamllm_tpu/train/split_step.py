"""Two-program (split) multimodal train step.

Some targets cannot compile the FUSED joint train graph — on this
environment's remote compile service the 1024px SDXL joint step crashes the
compiler outright (scripts/bench/train_step_mm_sdxl.py history), and the
same applies anywhere a single program exceeds a compiler's working-set
limits. This module decomposes `make_train_step`'s program into compiled
pieces with a well-defined autodiff seam, at the cost of ONE extra LLM
forward per step:

  P_enc : images_dm -> sampled+scaled VAE latents (frozen encoder — no
          gradient is lost by the split; the fused loss stop-gradients
          latents anyway)
  P_fwd : LLM forward -> (cond, uncond) dream-query hidden states
  P_head: diffusion loss forward+backward w.r.t (cond, uncond, trainable
          head leaves) — the big UNet graph, ALONE in its program (pass
          remat_unet=True for per-block UNet checkpointing)
  P_llm : LLM forward+backward of
            w_lm·lm + w_vm·(⟨cond, d_cond⟩ + ⟨uncond, d_uncond⟩)
          — the dot-trick: differentiating the inner products injects the
          head cotangent, so total grads EQUAL the fused step's
          d_lm + w_vm·Jᵀd_vm (tests/test_split_step.py)
  P_opt : optimizer update over the merged grads (state donated)

Both LLM-side and head-side programs differentiate ONLY their trainable
leaves (selected structurally from ``trainable_mask``): a full-tree
value_and_grad materializes gigabytes of zero grads for frozen subtrees —
at the 1024px scale that is the difference between fitting and OOM.

Scope: single-program-per-device training (no mesh/SP/PP/grad-accum —
on real pods you shard the fused step instead; this is the
compile-size/memory workaround) and no in-graph non-finite update gate.
The loss weighting (``loss_weight_lm/vm``, ``loss_scale``) matches
``dreamllm_forward``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreamllm_tpu.models.dreamllm import (
    DreamLLMConfig,
    extract_dream_hidden,
    masked_cross_entropy,
    multimodal_embed,
    unconditional_dream_hidden,
)
from dreamllm_tpu.models.llama import llama_forward, llama_logits
from dreamllm_tpu.train.step import TrainState

Params = dict[str, Any]


def _expand_mask(mask, params):
    """Prefix bool tree -> full bool tree over params' structure."""
    return jax.tree.map(
        lambda m, sub: jax.tree.map(lambda _: m, sub), mask, params
    )


def _split_trainable(params, full_mask):
    """-> (trainable {keystr: leaf}, treedef, flat [(keystr, leaf, bool)])."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    mflat = jax.tree_util.tree_flatten(full_mask)[0]
    rows = [(jax.tree_util.keystr(kp), leaf, bool(m))
            for (kp, leaf), m in zip(flat, mflat)]
    trainable = {k: leaf for k, leaf, m in rows if m}
    return trainable, treedef, rows


def make_split_train_step(
    cfg: DreamLLMConfig,
    tx: optax.GradientTransformation,
    *,
    head_cfg,
    head_loss_fn: Callable | None = None,   # default: by head_cfg type
    encode_latents_fn: Callable | None = None,
    trainable_mask=None,                    # prefix bool tree (param_freeze_mask)
    use_flash: bool = True,
    remat: bool | str = True,
    remat_unet: bool = True,
):
    """Build the five-program split step; returns
    ``step(state, batch, rng) -> (state, aux)`` with
    aux = {loss, lm_loss, vm_loss}.

    ``head_loss_fn(head_params, images_dm, cond, uncond, valid, rng, *,
    add_time_ids, latents, remat_unet)`` defaults to the SD(XL) loss picked
    from ``head_cfg``'s type; ``encode_latents_fn(head_params, head_cfg,
    images_dm, rng)`` likewise. ``trainable_mask`` is the same prefix tree
    given to ``make_optimizer`` — REQUIRED in spirit: without it every
    leaf is treated as trainable and the memory benefit evaporates.
    """
    from dreamllm_tpu.models.sd.sdxl import SDXLHeadConfig

    if isinstance(head_cfg, SDXLHeadConfig):
        from dreamllm_tpu.models.sd import sdxl as _m

        head_loss_fn = head_loss_fn or (
            lambda hp, dm, c, u, v, r, **kw: _m.sdxl_head_loss(
                hp, head_cfg, dm, c, u, v, r, **kw))
        encode_latents_fn = encode_latents_fn or (
            lambda hp, dm, r: _m.encode_latents(hp, head_cfg, dm, r))
    else:
        from dreamllm_tpu.models.sd import head as _m

        def _sd_loss(hp, dm, c, u, v, r, add_time_ids=None, latents=None,
                     remat_unet=False):
            del add_time_ids  # SDXL-only
            # latents is ALWAYS set here (P_enc runs first): the images_dm
            # operand this receives is a 1x1 shape dummy, so falling back to
            # the in-loss VAE encode would train on garbage
            assert latents is not None
            return _m.sd_head_loss(hp, head_cfg, dm, c, u, v, r,
                                   latents=latents, remat_unet=remat_unet)

        head_loss_fn = head_loss_fn or _sd_loss
        encode_latents_fn = encode_latents_fn or (
            lambda hp, dm, r: _m.encode_sd_latents(hp, head_cfg, dm, r))

    llm_cfg = cfg.llm
    w_lm, w_vm = cfg.loss_weight_lm, cfg.loss_weight_vm
    denom = 1.0
    if cfg.loss_scale != "none":
        denom = (w_lm + w_vm) if cfg.loss_scale == "l1" else float(
            np.sqrt(w_lm**2 + w_vm**2))
        denom = max(denom, 1e-8)

    enc = jax.jit(lambda hp, dm, r: encode_latents_fn(hp, dm, r))

    @jax.jit
    def p_fwd(params, batch):
        embeds = multimodal_embed(
            params, cfg, batch["input_ids"],
            images=batch.get("images"),
            image_positions=batch.get("image_positions"),
            dream_positions=batch.get("dream_positions"),
        )
        out = llama_forward(params["llm"], llm_cfg, inputs_embeds=embeds,
                            segment_ids=batch.get("segment_ids"),
                            positions=batch.get("positions"),
                            use_flash=use_flash)
        cond, valid = extract_dream_hidden(
            out["last_hidden_state"], batch["dream_positions"],
            cfg.n_dream_queries)
        uncond = unconditional_dream_hidden(params, cfg)
        return cond, uncond, valid

    @jax.jit
    def p_head(head_params, head_rows_trainable, latents, cond, uncond,
               valid, atids, rng, bm_dummy):
        # head_params is the FULL sd_head subtree (frozen leaves read from
        # it); head_rows_trainable the trainable {keystr: leaf} selection
        flat, treedef = jax.tree_util.tree_flatten_with_path(head_params)
        keys = [jax.tree_util.keystr(kp) for kp, _ in flat]

        def f(c, u, tp):
            leaves = [tp[k] if k in tp else jax.lax.stop_gradient(leaf)
                      for k, (_, leaf) in zip(keys, flat)]
            hp = jax.tree_util.tree_unflatten(treedef, leaves)
            return head_loss_fn(hp, bm_dummy, c, u, valid, rng,
                                add_time_ids=atids, latents=latents,
                                remat_unet=remat_unet)

        (vm, _aux), (d_cond, d_uncond, d_head) = jax.value_and_grad(
            lambda c, u, tp: f(c, u, tp), argnums=(0, 1, 2), has_aux=True,
        )(cond, uncond, head_rows_trainable)
        return vm, d_cond, d_uncond, d_head

    @jax.jit
    def p_llm(params, llm_rows_trainable, batch, d_cond, d_uncond, rng):
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        keys = [jax.tree_util.keystr(kp) for kp, _ in flat]

        def f(tp):
            leaves = [tp[k] if k in tp else jax.lax.stop_gradient(leaf)
                      for k, (_, leaf) in zip(keys, flat)]
            p = jax.tree_util.tree_unflatten(treedef, leaves)
            embeds = multimodal_embed(
                p, cfg, batch["input_ids"],
                images=batch.get("images"),
                image_positions=batch.get("image_positions"),
                dream_positions=batch.get("dream_positions"),
            )
            out = llama_forward(p["llm"], llm_cfg, inputs_embeds=embeds,
                                segment_ids=batch.get("segment_ids"),
                                positions=batch.get("positions"),
                                use_flash=use_flash, remat=remat)
            hidden = out["last_hidden_state"]
            lm = masked_cross_entropy(
                llama_logits(p["llm"], llm_cfg, hidden), batch["labels"])
            c, _ = extract_dream_hidden(hidden, batch["dream_positions"],
                                        cfg.n_dream_queries)
            u = unconditional_dream_hidden(p, cfg, remat=bool(remat))
            inj = (jnp.sum(c.astype(jnp.float32) * d_cond.astype(jnp.float32))
                   + jnp.sum(u.astype(jnp.float32) * d_uncond.astype(jnp.float32)))
            return (w_lm * lm + w_vm * inj.astype(jnp.float32)) / denom, lm

        (_, lm), g = jax.value_and_grad(f, has_aux=True)(llm_rows_trainable)
        return lm, g

    @partial(jax.jit, donate_argnums=(0,))
    def p_opt(state, g_llm, d_head):
        flat, treedef = jax.tree_util.tree_flatten_with_path(state.params)
        leaves = []
        for kp, leaf in flat:
            k = jax.tree_util.keystr(kp)
            if k in g_llm:
                leaves.append(g_llm[k])
            elif k.startswith("['sd_head']") and k[len("['sd_head']"):] in d_head:
                # head grads carry w_vm/denom scaling to match the fused
                # step's d(w_vm·vm/denom)
                leaves.append((d_head[k[len("['sd_head']"):]]
                               * (w_vm / denom)).astype(leaf.dtype))
            else:
                leaves.append(jnp.zeros_like(leaf))
        g = jax.tree_util.tree_unflatten(treedef, leaves)
        updates, opt_state = tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, opt_state)

    # precompute the trainable selections' KEYS host-side (leaves are taken
    # fresh from state each step)
    def step(state: TrainState, batch: dict, rng: jax.Array):
        params = state.params
        if trainable_mask is not None:
            fmask = _expand_mask(trainable_mask, params)
        else:
            fmask = jax.tree.map(lambda _: True, params)
        # LLM-side trainables: everything outside sd_head the mask keeps
        llm_mask = fmask
        if "sd_head" in fmask:
            llm_mask = {**fmask, "sd_head": jax.tree.map(
                lambda _: False, fmask["sd_head"])}
        llm_tp, _, _ = _split_trainable(params, llm_mask)
        head_tp, _, _ = _split_trainable(
            params["sd_head"], fmask.get("sd_head", jax.tree.map(
                lambda _: True, params["sd_head"])))

        hp = params["sd_head"]
        latents = enc(hp, batch["images_dm"], jax.random.fold_in(rng, 1))
        cond, uncond, valid = p_fwd(params, batch)
        bm_dummy = jnp.zeros(batch["images_dm"].shape[:2] + (1, 1, 3),
                             batch["images_dm"].dtype)
        atids = batch.get("add_time_ids")
        if atids is None:
            s = batch["images_dm"].shape
            atids = jnp.broadcast_to(
                jnp.asarray([s[2], s[3], 0, 0, s[2], s[3]], jnp.float32),
                (s[0], s[1], 6))
        vm, d_cond, d_uncond, d_head = p_head(
            hp, head_tp, latents, cond, uncond, valid, atids,
            jax.random.fold_in(rng, 2), bm_dummy)
        lm, g_llm = p_llm(params, llm_tp, batch, d_cond, d_uncond,
                          jax.random.fold_in(rng, 3))
        new_state = p_opt(state, g_llm, d_head)
        loss = (w_lm * lm + w_vm * vm) / denom
        return new_state, {"loss": loss, "lm_loss": lm, "vm_loss": vm}

    return step
