"""Training loop: step/log/validate/save orchestration over the jitted step.

TPU-native equivalent of the reference's Trainer fork (omni/train/trainer.py
:100-1188) minus everything XLA/pjit already subsumes (FSDP wrapping, AMP,
DeepSpeed engine, grad-scaler). What remains — and is ported:

  * step loop with NaN/Inf loss filtering (:768-777)
  * scalar log channel averaged across devices (additional_log_info,
    :919-958 — ours come back from the jitted step already reduced)
  * tokens/sec + step-time speed metrics (trainer_utils.py:359-386)
  * ``val_steps``-gated mid-training generation through a user
    ``val_processor`` (:1101-1188)
  * checkpoint-every-save_steps with the LLM-vs-plugin split layout +
    auto-resume from the latest checkpoint (train.py:206-209)
  * callback hooks (trainer_callback.py:307-475, reduced to a small
    protocol: on_step/on_log/on_save/on_validate)
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Iterable

import jax
import numpy as np

from dreamllm_tpu.train.checkpoints import (
    latest_checkpoint,
    load_host_state,
    load_opt_state,
    load_params,
    checkpoint_step,
    save_checkpoint,
)
from dreamllm_tpu.train.step import TrainState
from dreamllm_tpu.utils.logging import get_logger

logger = get_logger("dreamllm_tpu.train")


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 1000
    log_steps: int = 10
    save_steps: int = 500
    val_steps: int = 0          # 0 disables mid-training validation
    output_dir: str = "./runs/train"
    resume: bool = True
    tokens_per_batch: int | None = None  # for tokens/sec reporting
    # keep at most N checkpoints, oldest deleted after each save — HF
    # TrainingArguments save_total_limit, which the reference's recipes set
    # (e.g. dreamllm_sdxl stage1/base.py:81 save_total_limit=3). None = all.
    save_total_limit: int | None = None


class Trainer:
    def __init__(
        self,
        cfg: TrainerConfig,
        step_fn: Callable,                 # (state, batch, rng) -> (state, aux)
        data_iter: Iterable,               # yields device-ready batches
        state: TrainState,
        *,
        rng: jax.Array | None = None,
        val_fn: Callable[[Any, int], dict] | None = None,  # (params, step) -> logs
        callbacks: list | None = None,
    ):
        self.cfg = cfg
        self.step_fn = step_fn
        self.data_source = data_iter   # kept for resumable-stream protocol
        self.data_iter = iter(data_iter)
        self.state = state
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.val_fn = val_fn
        self.callbacks = callbacks or []
        self.log_buffer: list[dict] = []

    # ---- callbacks ----
    def _fire(self, hook: str, **kw):
        for cb in self.callbacks:
            fn = getattr(cb, hook, None)
            if fn is not None:
                fn(trainer=self, **kw)

    def maybe_resume(self):
        if not self.cfg.resume:
            return
        path = latest_checkpoint(self.cfg.output_dir)
        if path is None:
            return
        logger.info("resuming from %s", path)
        params = load_params(path, like=self.state.params)
        opt_state = load_opt_state(path, like=self.state.opt_state)
        import jax.numpy as jnp

        self.state = TrainState(
            step=jnp.asarray(checkpoint_step(path), jnp.int32),
            params=params,
            opt_state=opt_state,
        )
        # host-side state: RNG + data-stream position (reference
        # trainer.py:698-757 — RNG reload + skip_first_batches). Without this
        # a resumed run replays data from the stream start with a fresh RNG:
        # silent sample repetition on every preemption.
        hs = load_host_state(path)
        if hs is None:
            logger.warning(
                "checkpoint has no host_state.json — resuming params only "
                "(data stream restarts; samples may repeat)"
            )
            return
        if "rng" in hs:
            self.rng = jnp.asarray(np.asarray(hs["rng"], np.uint32))
        if "data_state" in hs and hasattr(self.data_source, "load_state_dict"):
            self.data_source.load_state_dict(hs["data_state"])
            self.data_iter = iter(self.data_source)
            logger.info("restored data stream state")
        elif hs.get("data_position"):
            n = int(hs["data_position"])
            logger.info("skipping %d consumed batches to restore data position", n)
            for _ in range(n):
                next(self.data_iter)

    _last_saved: int = -1

    def save(self, step: int):
        # NOTE: every process must enter save_checkpoint — orbax serialization
        # of multi-host-sharded arrays is a collective; a rank-0-only call
        # deadlocks waiting for the other hosts' shards. Orbax handles the
        # single-writer coordination internally.
        if step == self._last_saved:
            return
        host_state: dict = {
            "rng": np.asarray(jax.device_get(self.rng)).tolist(),
            "data_position": step,
        }
        if hasattr(self.data_source, "state_dict"):
            host_state["data_state"] = self.data_source.state_dict()
        path = save_checkpoint(
            self.cfg.output_dir, step, self.state.params, self.state.opt_state,
            host_state=host_state,
        )
        self._last_saved = step
        logger.info("saved %s", path)
        self._prune_checkpoints()
        self._fire("on_save", step=step, path=path)

    def _prune_checkpoints(self):
        """Delete oldest checkpoint-* dirs past save_total_limit (HF
        semantics: applied after each save, newest kept). Process 0 only —
        a shared filesystem must see exactly one rmtree."""
        limit = self.cfg.save_total_limit
        if not limit or jax.process_index() != 0:
            return
        import re
        import shutil

        root = self.cfg.output_dir
        steps = sorted(
            int(m.group(1))
            for name in os.listdir(root)
            if (m := re.fullmatch(r"checkpoint-(\d+)", name))
        )
        for s in steps[:-limit]:
            victim = os.path.join(root, f"checkpoint-{s:06d}")
            shutil.rmtree(victim, ignore_errors=True)
            logger.info("pruned %s (save_total_limit=%d)", victim, limit)

    def train(self):
        self.maybe_resume()
        start_step = int(self.state.step)
        t_last = time.perf_counter()
        for step in range(start_step, self.cfg.max_steps):
            batch = next(self.data_iter)
            self.rng, sub = jax.random.split(self.rng)
            # NaN/Inf filtering happens INSIDE the jitted step (make_train_step
            # skip_nonfinite): the update is dropped on-device and
            # aux["update_skipped"] reports it. No per-step host fetch — a
            # float(aux["loss"]) here would block async dispatch every step.
            self.state, aux = self.step_fn(self.state, batch, sub)
            self.log_buffer.append(aux)  # device scalars; fetched at log time
            self._fire("on_step", step=step + 1, aux=aux)

            cur = step + 1
            if self.cfg.log_steps and cur % self.cfg.log_steps == 0:
                buffered = jax.device_get(self.log_buffer)  # one host sync
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()

                def window_mean(k):
                    # skipped steps leave NaN losses in the buffer by design
                    # (the update was dropped on-device); exclude them from
                    # the window means instead of poisoning the whole log
                    # (reference NaN-loss log filtering, trainer.py:768-777)
                    vals = np.asarray([b[k] for b in buffered], np.float64)
                    finite = vals[np.isfinite(vals)]
                    return float(finite.mean()) if finite.size else float("nan")

                logs = {k: window_mean(k) for k in buffered[0]}
                # len(buffered), not log_steps: the first window after a
                # resume may be short
                logs["steps_per_sec"] = len(buffered) / dt
                if self.cfg.tokens_per_batch:
                    logs["tokens_per_sec"] = self.cfg.tokens_per_batch * len(buffered) / dt
                self.log_buffer.clear()
                skipped = logs.get("update_skipped", 0.0)
                if skipped:
                    logger.warning(
                        "%d/%d updates skipped on non-finite loss in this window",
                        int(round(skipped * len(buffered))), len(buffered),
                    )
                logger.info("step %d: %s", cur, {k: round(v, 5) for k, v in logs.items()})
                self._fire("on_log", step=cur, logs=logs)

            if self.cfg.val_steps and cur % self.cfg.val_steps == 0 and self.val_fn:
                val_logs = self.val_fn(self.state.params, cur)
                scalars = {
                    k: round(float(v), 5) for k, v in val_logs.items()
                    if np.ndim(v) == 0
                }
                arrays = [k for k, v in val_logs.items() if np.ndim(v) > 0]
                logger.info("validation @%d: %s arrays=%s", cur, scalars, arrays)
                self._fire("on_validate", step=cur, logs=val_logs)

            if self.cfg.save_steps and cur % self.cfg.save_steps == 0:
                self.save(cur)

        if int(self.state.step) > start_step:
            self.save(int(self.state.step))
        return self.state
