"""Text→image evaluation protocol: multi-seed sampling + CLIP best-of-N
re-ranking + FID.

TPU-native equivalent of the reference's COCO/LN-COCO drivers
(omni/eval/text2img/ddp_sample_coco.py:85-169 "dreamllm" phase, :351-386
"select" phase; scripts/eval/text2img/eval_coco_zero_shot_clip8_select.sh —
30k captions × 8 seeds, 150 steps, guidance 2.0, CLIP-L/14 argmax re-rank,
FID vs fid_stats_mscoco256_val.npz @256px). Work is sharded across hosts by
``jax.process_index`` striding instead of accelerate process splits.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.eval.fid import (
    activation_statistics,
    compute_fid,
    frechet_distance,
    inception_pool3,
)


@dataclasses.dataclass
class T2IProtocol:
    num_seeds: int = 8
    num_inference_steps: int = 150
    guidance_scale: float = 2.0
    image_size: int = 256     # FID resolution
    batch_size: int = 4


def lncoco_protocol(**kw) -> T2IProtocol:
    """LN-COCO defaults (ddp_sample_lncoco.py:29-42 launch recipe: 100 steps,
    guidance 3.0; single seed per caption — the reference LN-COCO driver has
    no CLIP re-rank phase)."""
    defaults = dict(num_seeds=1, num_inference_steps=100, guidance_scale=3.0)
    defaults.update(kw)
    return T2IProtocol(**defaults)


def load_lncoco_captions(jsonl_path: str, seed: int = 0, max_images: int | None = None) -> list[str]:
    """LN-COCO (Localized Narratives) caption loader — one caption per image.

    Mirrors ddp_sample_lncoco.py:46-68 + :173-183: the jsonl carries
    ``{"image_id": ..., "caption": ...}`` rows; captions group by image and
    one is drawn per image at random (``random.choice(captions)``).
    """
    import json
    import random

    per_image: dict[int, list[str]] = {}
    order: list[int] = []
    with open(jsonl_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            iid = int(obj["image_id"])
            if iid not in per_image:
                per_image[iid] = []
                order.append(iid)
            per_image[iid].append(str(obj["caption"]))
    rng = random.Random(seed)
    caps = [rng.choice(per_image[i]) for i in order]
    return caps[:max_images] if max_images else caps


def sample_candidates(
    pipeline_fn: Callable[[Sequence[str], jax.Array], jnp.ndarray],
    captions: Sequence[str],
    protocol: T2IProtocol,
    base_seed: int = 0,
) -> np.ndarray:
    """[N, num_seeds, H, W, 3] in [0,1]. ``pipeline_fn(captions, rng)`` is the
    model-specific prompt→images function (e.g. LLM encode + sd_head_pipeline)."""
    n = len(captions)
    out = None
    for s in range(protocol.num_seeds):
        imgs_seed = []
        for i in range(0, n, protocol.batch_size):
            chunk = list(captions[i : i + protocol.batch_size])
            rng = jax.random.PRNGKey(base_seed + s * 100003 + i)
            imgs = pipeline_fn(chunk, rng)
            imgs_seed.append(np.asarray(imgs))
        imgs_seed = np.concatenate(imgs_seed, axis=0)
        if out is None:
            out = np.zeros((n, protocol.num_seeds) + imgs_seed.shape[1:], np.float32)
        out[:, s] = imgs_seed
    return out


def clip_select(
    candidates: np.ndarray,      # [N, S, H, W, 3] in [0,1]
    captions: Sequence[str],
    clip_score_fn: Callable[[np.ndarray, Sequence[str]], np.ndarray],
) -> np.ndarray:
    """Best-of-S by CLIP image-text score (ddp_sample_coco.py:351-386).
    ``clip_score_fn(images [M,H,W,3], captions [M]) -> [M] scores`` (diagonal
    of logits_per_image)."""
    n, s = candidates.shape[:2]
    flat = candidates.reshape((n * s,) + candidates.shape[2:])
    caps = [c for c in captions for _ in range(s)]
    scores = np.asarray(clip_score_fn(flat, caps)).reshape(n, s)
    best = scores.argmax(axis=1)
    return candidates[np.arange(n), best]


def fid_from_images(
    inception_params,
    images: np.ndarray,           # [N, H, W, 3] in [0,1]
    reference: np.ndarray | str,  # [M, H, W, 3] images or stats .npz path
    batch_size: int = 32,
) -> float:
    feats = extract_inception_features(inception_params, images, batch_size)
    if isinstance(reference, str):
        d = np.load(reference)
        mu1, s1 = activation_statistics(feats)
        return frechet_distance(mu1, s1, d["mu"], d["sigma"])
    ref_feats = extract_inception_features(inception_params, reference, batch_size)
    return compute_fid(feats, ref_feats)


def extract_inception_features(inception_params, images: np.ndarray, batch_size: int = 32):
    fn = jax.jit(lambda p, x: inception_pool3(p, x))
    feats = []
    for i in range(0, len(images), batch_size):
        x = jnp.asarray(images[i : i + batch_size], jnp.float32)
        feats.append(np.asarray(fn(inception_params, x)))
    return np.concatenate(feats, axis=0)


def run_protocol(
    pipeline_fn,
    clip_score_fn,
    inception_params,
    captions: Sequence[str],
    reference,
    protocol: T2IProtocol = T2IProtocol(),
    *,
    shard: bool = True,
    save_dir: str | None = None,
) -> dict:
    """Full COCO-style protocol on this host's caption shard."""
    if shard:
        captions = list(captions[jax.process_index():: jax.process_count()])
    cands = sample_candidates(pipeline_fn, captions, protocol)
    best = clip_select(cands, captions, clip_score_fn)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        np.save(os.path.join(save_dir, f"images_rank{jax.process_index()}.npy"), best)
    fid = fid_from_images(inception_params, best, reference)
    return {"fid": fid, "n": len(captions)}
