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
    model-specific prompt→images function (e.g. LLM encode + sd_head_pipeline).

    NOTE: materializes every candidate — fine for smokes/LN-COCO-scale runs;
    the 30k×8-seed COCO protocol must use :func:`sample_and_select` (running
    best-of-S, one image per caption resident)."""
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


def sample_and_select(
    pipeline_fn: Callable[[Sequence[str], jax.Array], jnp.ndarray],
    captions: Sequence[str],
    clip_score_fn: Callable[[np.ndarray, Sequence[str]], np.ndarray],
    protocol: T2IProtocol,
    base_seed: int = 0,
) -> np.ndarray:
    """CLIP-select best-of-num_seeds with a RUNNING argmax: each seed's batch
    is scored as it is generated and only the best image per caption stays
    resident. At the documented COCO scale (30k captions × 8 seeds × 256px)
    the all-candidates buffer is ~189 GB fp32 — this keeps ~24 GB worst case
    (one best image per caption) and scales with N, not N×S."""
    n = len(captions)
    best_imgs: np.ndarray | None = None
    best_scores = np.full((n,), -np.inf, np.float32)
    for s in range(protocol.num_seeds):
        for i in range(0, n, protocol.batch_size):
            chunk = list(captions[i : i + protocol.batch_size])
            rng = jax.random.PRNGKey(base_seed + s * 100003 + i)
            imgs = np.asarray(pipeline_fn(chunk, rng))
            scores = np.asarray(clip_score_fn(imgs, chunk))
            if best_imgs is None:
                best_imgs = np.zeros((n,) + imgs.shape[1:], np.float32)
            sl = slice(i, i + len(chunk))
            improve = scores > best_scores[sl]
            best_scores[sl] = np.where(improve, scores, best_scores[sl])
            best_imgs[sl][improve] = imgs[improve]
    return best_imgs


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


_inception_jit = jax.jit(inception_pool3)  # one compile per (batch, hw) shape


def extract_inception_features(inception_params, images: np.ndarray, batch_size: int = 32):
    feats = []
    for i in range(0, len(images), batch_size):
        x = jnp.asarray(images[i : i + batch_size], jnp.float32)
        if x.shape[0] != batch_size and len(images) > batch_size:
            # pad the ragged tail to the compiled batch shape
            pad = batch_size - x.shape[0]
            feats.append(np.asarray(
                _inception_jit(inception_params, jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0))))
            )[: x.shape[0]])
        else:
            feats.append(np.asarray(_inception_jit(inception_params, x)))
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
    """Full COCO-style protocol; multi-host runs pool features before FID.

    Sampling + CLIP-select run as a running best-of-S (``sample_and_select``
    — the all-candidates buffer is ~189 GB at 30k×8×256px). With
    ``process_count() > 1`` each host scores its caption shard, then the
    pool-3 FEATURES all-gather across hosts so the Fréchet statistics cover
    the full caption set — per-shard FID is biased by its smaller N and is
    not the protocol number.
    """
    if shard:
        captions = list(captions[jax.process_index():: jax.process_count()])
    best = sample_and_select(pipeline_fn, captions, clip_score_fn, protocol)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        np.save(os.path.join(save_dir, f"images_rank{jax.process_index()}.npy"), best)
    feats = extract_inception_features(inception_params, best)
    if shard and jax.process_count() > 1:
        from dreamllm_tpu.utils.comm import all_gather_objects

        feats = np.concatenate(all_gather_objects(feats), axis=0)
    mu, sigma = activation_statistics(feats)
    if isinstance(reference, str):
        d = np.load(reference)
        fid = frechet_distance(mu, sigma, d["mu"], d["sigma"])
    else:
        ref_feats = extract_inception_features(inception_params, reference)
        mu2, s2 = activation_statistics(ref_feats)
        fid = frechet_distance(mu, sigma, mu2, s2)
    return {"fid": fid, "n": len(feats)}
