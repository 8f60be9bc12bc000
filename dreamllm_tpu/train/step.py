"""pjit train step: joint LM+diffusion loss, grad accumulation, remat.

The TPU-native core of the reference's Trainer hot loop (trainer.py:718-819:
training_step → accelerator.backward → clip → optimizer.step). One jitted
function over the (data, fsdp, tp) mesh replaces the DDP/FSDP/DeepSpeed
engine split; XLA inserts all collectives. The ``additional_log_info``
channel (trainer.py:919-958) maps to the returned ``aux`` scalar dict —
already mean-reduced across devices by virtue of being computed inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from dreamllm_tpu.models.dreamllm import DreamLLMConfig, dreamllm_forward


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def init_train_state(params, tx: optax.GradientTransformation, *, mesh=None) -> TrainState:
    """``mesh``: pass the global mesh in multi-process runs. Eager
    ``tx.init`` derives the moment shardings from ``params``, but every
    leaf it creates from scratch (optax step counts, the step scalar) is a
    HOST-LOCAL single-device array — orbax refuses to serialize those in a
    multi-host world ("Cannot serialize host local jax.Array"), so the
    first multi-host ``save_checkpoint`` would crash. Replicating them over
    the global mesh makes the whole state a global pytree; values are
    identical on every host (zeros), which is exactly the case
    ``jax.device_put`` supports cross-host."""
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )
    if mesh is None or jax.process_count() == 1:
        return state
    from jax.sharding import NamedSharding, PartitionSpec

    repl = NamedSharding(mesh, PartitionSpec())
    global_devices = set(mesh.devices.flat)

    def _globalize(x):
        if isinstance(x, jax.Array) and set(x.sharding.device_set) != global_devices:
            return jax.device_put(x, repl)
        return x

    return jax.tree.map(_globalize, state)


def make_train_step(
    cfg: DreamLLMConfig,
    tx: optax.GradientTransformation,
    *,
    head_loss_fn: Callable | None = None,
    head_in_params: bool = True,
    grad_accum: int = 1,
    remat: bool | str | int = True,
    scan_unroll: int | bool = 1,
    use_flash: bool = True,
    donate: bool = True,
    skip_nonfinite: bool = True,
    mesh=None,
    trainable_mask=None,
):
    """Build the jitted train step.

    The returned fn has signature ``(state, batch, rng) -> (state, aux)``.
    When ``grad_accum > 1`` the batch's leading dim must be divisible by it;
    micro-batches run under ``lax.scan`` with gradient averaging (replaces
    ``accelerator.accumulate``, trainer.py:765).

    ``head_in_params``: the diffusion head lives in ``params["sd_head"]`` and
    trains jointly (pass False to run LM-only configs).

    ``mesh``: required when ``cfg.sequence_parallel_axis`` (ring attention,
    parallel/ring.py) or ``cfg.pipeline_parallel_axis`` (GPipe-style layer
    staging, parallel/pipeline.py) is set — the loss forward then runs the
    decoder through the corresponding shard_map program over that mesh axis.

    ``remat``: True/"full" = recompute whole layers in backward (min memory);
    "dots" = save per-layer matmul outputs, recompute only elementwise + the
    flash kernel, costing ~2·(5H+2I)·B·S·L extra bytes of stacked residuals;
    an int k = first L-k layers "dots", last k save-all (partial
    checkpointing — a capacity knob, llama.py). Measured on v5e (0.94B,
    b4 s2048, flash, 8-bit AdamW) WITH buffer donation: dots 644 ms vs
    full 676-689 — "dots" wins once donation frees the liveness, but
    "full" stays the default for headroom at bigger configs; see
    docs/TRAINING.md for the full r3 lever study.

    ``scan_unroll``: forwarded to llama_forward — True (full unroll)
    removes the per-layer dynamic slice of the stacked params, measured
    623 vs 644 ms/step at the config above; costs compile time.

    ``trainable_mask``: the same bool (prefix) pytree given to
    ``make_optimizer`` — when provided, frozen subtrees are
    ``stop_gradient``-pruned from the backward graph instead of having
    their grads computed and then zeroed by the optimizer mask (stage-2:
    skips the whole CLIP-tower backward and the UNet's param-grad pass;
    the VAE backward was already cut by the head's latent stop_gradient).
    Trainable updates are bit-identical, and ``max_grad_norm`` clipping is
    unchanged (it always ran inside the optimizer's masked branch, seeing
    trainable grads only). What changes: the reported ``aux["grad_norm"]``
    / the skip_nonfinite gate now measure trainable grads only, and frozen
    params are additionally pinned at the update level (a tx built without
    the matching mask can no longer weight-decay them).

    ``skip_nonfinite``: the reference's NaN/Inf loss filter (trainer.py:
    768-777) moved INSIDE the jitted step — on a non-finite loss or grad
    norm the params/opt-state update is dropped via ``jnp.where`` selects,
    so the host never has to fetch the loss per step (a per-step ``float()``
    blocks JAX async dispatch and serializes host↔device). ``aux
    ["update_skipped"]`` reports 1.0 when the update was dropped; the step
    counter still advances (the data stream consumed the batch).
    """

    def loss_fn(params, batch, rng):
        if trainable_mask is not None:
            # prune frozen subtrees from the autodiff graph: without this,
            # value_and_grad computes FULL backward passes for params the
            # optimizer mask then zeroes — in stage-2 that's the whole CLIP
            # tower backward and the UNet's param-grad pass (its activation
            # grads still flow to the dream-query states, as they must).
            # Frozen leaves come back as zero grads. MASK-first tree.map:
            # the mask is a PREFIX tree (one bool covers a whole
            # QTensor/Q4Tensor node, same contract optax.multi_transform
            # accepts), so the mask supplies the structure and
            # stop_gradient applies subtree-wide.
            params = jax.tree.map(
                lambda m, p: p if m else jax.lax.stop_gradient(p),
                trainable_mask, params,
            )
        head_params = params.get("sd_head") if head_in_params else None
        return dreamllm_forward(
            params, cfg, batch,
            head_loss_fn=head_loss_fn if head_in_params else None,
            head_params=head_params,
            rng=rng,
            use_flash=use_flash,
            remat=remat,
            scan_unroll=scan_unroll,
            mesh=mesh,
        )

    # allow_int: with a mask, frozen subtrees may hold int8/int4 weights
    # (QTensor/Q4Tensor — a quantized frozen tower); their grads come back
    # as float0 and are replaced with fp32 zeros below so global_norm and
    # the grad-accum sum stay well-typed. Unmasked behavior is unchanged.
    grad_fn = jax.value_and_grad(
        loss_fn, has_aux=True, allow_int=trainable_mask is not None
    )

    def micro(params, batch, rng):
        (loss, aux), grads = grad_fn(params, batch, rng)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda m, p, g: g if m else jax.tree.map(
                    lambda pl: jnp.zeros(pl.shape, jnp.float32), p),
                trainable_mask, params, grads,
            )
        aux = dict(aux, loss=loss)
        return grads, aux

    def step_fn(state: TrainState, batch, rng):
        if grad_accum == 1:
            grads, aux = micro(state.params, batch, rng)
        else:
            def split(x):
                return x.reshape((grad_accum, x.shape[0] // grad_accum) + x.shape[1:])

            micro_batches = jax.tree.map(split, batch)
            rngs = jax.random.split(rng, grad_accum)

            def scan_body(carry, xs):
                mb, r = xs
                g, a = micro(state.params, mb, r)
                # accumulate in fp32: a bf16 running sum absorbs small
                # micro-grads (x + eps == x at 8 mantissa bits), biasing the
                # accumulated gradient vs the equivalent large batch
                carry = jax.tree.map(
                    lambda c, gi: c + gi.astype(jnp.float32), carry, g
                )
                return carry, a

            zero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            grads, auxes = jax.lax.scan(scan_body, zero, (micro_batches, rngs))
            grads = jax.tree.map(
                lambda g, p: (g / grad_accum).astype(p.dtype), grads, state.params
            )
            aux = jax.tree.map(lambda a: jnp.mean(a, axis=0), auxes)

        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if trainable_mask is not None:
            # self-enforcing freeze: even if tx was (mis)built without the
            # matching mask, a frozen param never moves — otherwise
            # unmasked weight decay would turn the pruned zero grads into
            # update = -lr·wd·p and silently shrink "frozen" weights
            updates = jax.tree.map(
                lambda m, u: u if m else jax.tree.map(jnp.zeros_like, u),
                trainable_mask, updates,
            )
        params = optax.apply_updates(state.params, updates)
        aux = dict(aux, grad_norm=gnorm)
        if skip_nonfinite:
            ok = jnp.isfinite(aux["loss"]) & jnp.isfinite(gnorm)

            def sel(n, o):
                return jnp.where(ok, n, o)

            params = jax.tree.map(sel, params, state.params)
            opt_state = jax.tree.map(sel, opt_state, state.opt_state)
            aux["update_skipped"] = (~ok).astype(jnp.float32)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, aux

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
