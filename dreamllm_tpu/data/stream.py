"""Stateful, resumable batch streams.

The reference restores a preempted run's data position by replaying the
dataloader (``skip_first_batches`` + RNG reload, omni/train/trainer.py:698-757)
— O(steps) host work on every resume. Here the stream itself is a small state
machine: ``state_dict()`` captures the sample cursor and the builder's RNG
bit-generator state, so ``load_state_dict()`` resumes in O(1) and the sample
sequence continues exactly where it stopped.

``train.Trainer`` persists this state into the checkpoint's host_state.json
whenever the stream it was given exposes the protocol (otherwise it falls back
to batch-replay via ``data_position``).

Packing caveat: with ``pack=True`` up to ``batch_size - 1`` leftover packed
rows may be pending when a checkpoint is taken; they are built from samples
already consumed from the cursor, so an O(1)-resumable snapshot cannot keep
them without serializing image tensors into the checkpoint. We drop them on
restore (bounded, logged) — samples are *skipped*, never repeated.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from dreamllm_tpu.data.collator import collate, collate_packed, pack_samples
from dreamllm_tpu.utils.logging import get_logger

logger = get_logger("dreamllm_tpu.data.stream")


class BatchStream:
    """Infinite batch iterator over an indexable sample source.

    source        — ``len()`` + ``[]`` (a MixedDataset); iterated modulo.
    builder       — DreamLLMBuilder (``build(sample) -> BuiltSample``; its
                    ``rng`` is part of the resumable state).
    collate_kw    — kwargs for :func:`collate` / :func:`collate_packed`.
    pack          — first-fit pack ``pack_block``× samples into seq_len rows.
    """

    def __init__(self, source, builder, batch_size: int, collate_kw: dict,
                 *, pack: bool = False, pack_block: int = 4,
                 image_embed_len: int = 256, n_dream_queries: int = 64):
        self.source = source
        self.builder = builder
        self.batch_size = batch_size
        self.collate_kw = dict(collate_kw)
        self.pack = pack
        self.pack_block = pack_block
        self.image_embed_len = image_embed_len
        self.n_dream_queries = n_dream_queries
        self._i = 0
        self._pending: list = []  # packed rows awaiting batching

    def __iter__(self):
        return self

    def _build(self, want: int) -> list:
        out = []
        n = len(self.source)
        while len(out) < want:
            try:
                out.append(self.builder.build(self.source[self._i % n]))
            except Exception as e:  # per-sample fault tolerance
                logger.warning("sample %d failed: %s", self._i, e)
            finally:
                self._i += 1
        return out

    def __next__(self) -> dict:
        bs = self.batch_size
        if not self.pack:
            return collate(self._build(bs), **self.collate_kw)
        while len(self._pending) < bs:
            self._pending.extend(pack_samples(
                self._build(bs * self.pack_block),
                self.collate_kw["seq_len"],
                image_embed_len=self.image_embed_len,
                n_dream_queries=self.n_dream_queries,
            ))
        rows, self._pending[:] = self._pending[:bs], self._pending[bs:]
        return collate_packed(rows, **self.collate_kw)

    # ---- resumable-stream protocol (consumed by train.Trainer) ----

    def state_dict(self) -> dict:
        return {
            "cursor": self._i,
            "builder_rng": self.builder.rng.bit_generator.state,
            "pending_rows": len(self._pending),
        }

    def load_state_dict(self, state: dict) -> None:
        self._i = int(state["cursor"])
        self.builder.rng.bit_generator.state = state["builder_rng"]
        if state.get("pending_rows"):
            logger.info(
                "resume drops %d pending packed rows (samples skipped, not "
                "repeated)", state["pending_rows"])
        self._pending = []


class MappedStream:
    """Apply ``fn`` per batch while forwarding the resumable-stream protocol
    (so device_put / jnp-conversion wrappers don't hide state_dict from the
    Trainer)."""

    def __init__(self, stream, fn: Callable[[Any], Any]):
        self.stream = stream
        self.fn = fn

    def __iter__(self):
        return self

    def __next__(self):
        return self.fn(next(self.stream))

    def __getattr__(self, name):
        # forwards state_dict/load_state_dict when (and only when) the
        # wrapped stream has them — hasattr() on the wrapper then answers
        # truthfully, which is what Trainer's protocol check relies on
        return getattr(self.stream, name)
