"""Batch collation: pad ids/labels, stack pixel arrays to fixed
[B, max_images, H, W, 3] buffers, pad position arrays with -1.

Replaces the reference collators (builder_dreamllm.py:467-504) which pad ids
and torch.cat ragged image lists; here absent spans become -1 positions that
the model's scatter drops, keeping every batch the same shape for jit.
"""

from __future__ import annotations

import numpy as np

from dreamllm_tpu.data.builder import IGNORE, BuiltSample


def collate(
    samples: list[BuiltSample],
    *,
    pad_token_id: int = 0,
    max_images: int | None = None,
    max_dreams: int | None = None,
    seq_len: int | None = None,
    image_size: int = 224,
    image_size_dm: int = 256,
) -> dict:
    b = len(samples)
    seq_len = seq_len or max(len(s.input_ids) for s in samples)
    max_images = max_images if max_images is not None else max(
        (len(s.images) for s in samples), default=0
    )
    max_dreams = max_dreams if max_dreams is not None else max(
        (len(s.images_dm) for s in samples), default=0
    )

    ids = np.full((b, seq_len), pad_token_id, np.int32)
    labels = np.full((b, seq_len), IGNORE, np.int32)
    seg = np.zeros((b, seq_len), np.int32)
    pos = np.zeros((b, seq_len), np.int32)

    images = np.zeros((b, max_images, image_size, image_size, 3), np.float32)
    image_positions = np.full((b, max_images), -1, np.int32)
    images_dm = np.zeros((b, max_dreams, image_size_dm, image_size_dm, 3), np.float32)
    dream_positions = np.full((b, max_dreams), -1, np.int32)

    for i, s in enumerate(samples):
        n = min(len(s.input_ids), seq_len)
        ids[i, :n] = s.input_ids[:n]
        labels[i, :n] = s.labels[:n]
        seg[i, :n] = 1
        pos[i, :n] = np.arange(n)
        for j, (img, p) in enumerate(zip(s.images, s.image_positions)):
            if j >= max_images or p + img.shape[0] < 0 or p >= seq_len:
                continue
            images[i, j] = img
            image_positions[i, j] = p
        for j, (img, p) in enumerate(zip(s.images_dm, s.dream_positions)):
            if j >= max_dreams or p >= seq_len:
                continue
            images_dm[i, j] = img
            dream_positions[i, j] = p

    out = {
        "input_ids": ids,
        "labels": labels,
        "segment_ids": seg,
        "positions": pos,
    }
    if max_images:
        out["images"] = images
        out["image_positions"] = image_positions
    if max_dreams:
        out["images_dm"] = images_dm
        out["dream_positions"] = dream_positions
    return out
