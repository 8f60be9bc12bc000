"""FID: Fréchet distance + InceptionV3 (pytorch-fid-compatible) in JAX.

TPU-native equivalent of the reference's FID stack
(third_party/pytorch-fid/src/pytorch_fid/{fid_score,inception}.py, driven by
scripts/eval/text2img/*.sh against ``fid_stats_mscoco256_val.npz``). The
InceptionV3 here reproduces the *FID variant* of the torchvision model that
pytorch-fid uses — same layer stack and the three FID quirks (FIDInceptionA/C
use count_include_pad=False avg-pooling; FIDInceptionE_2 uses max-pooling in
the branch_pool) — so converted torchvision weights give matching pool3
activations. Input protocol: 299×299, scaled to [-1, 1] (inception.py's
``normalize_input``), NHWC.

``frechet_distance`` matches pytorch-fid's numerics (scipy sqrtm on CPU —
the 2048×2048 sqrtm is host work; activations come from the TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.sd.blocks import init_conv

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Fréchet distance
# ---------------------------------------------------------------------------


def activation_statistics(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of [N, D] activations."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||² + Tr(S1 + S2 - 2·sqrt(S1·S2)) (fid_score.py calculate_
    frechet_distance numerics, incl. the eps-on-diagonal retry)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"sqrtm has large imaginary component")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


# ---------------------------------------------------------------------------
# InceptionV3 (FID variant)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class InceptionConfig:
    dtype: Any = jnp.float32
    normalize_input: bool = True  # map [0,1] -> [-1,1]


def _bn_conv(key, kh, kw, cin, cout, dtype):
    """Conv + folded batch-norm (inference): store conv w plus bn scale/bias.
    torchvision BasicConv2d = conv(no bias) + BN + relu."""
    return {
        "conv": init_conv(key, kh, kw, cin, cout, dtype),
        "bn_scale": jnp.ones((cout,), dtype),
        "bn_bias": jnp.zeros((cout,), dtype),
    }


def _apply_bn_conv(p, x, stride=1, padding="SAME"):
    from dreamllm_tpu.models.sd.blocks import conv2d

    y = conv2d(x, {"w": p["conv"]["w"], "b": jnp.zeros_like(p["bn_bias"])},
               stride=stride, padding=padding)
    y = y * p["bn_scale"] + p["bn_bias"]
    return jax.nn.relu(y)


def _avg_pool(x, window=3, stride=1, pad="SAME", count_include_pad=True):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), pad
    )
    if count_include_pad:
        return s / (window * window)
    ones = jnp.ones_like(x[..., :1])
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), pad
    )
    return s / cnt


def _max_pool(x, window=3, stride=2, pad="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pad
    )


# --- block initializers (channel plumbing follows torchvision InceptionV3) ---


def _mixed_a(key, cin, pool_ch, dtype):  # InceptionA / FIDInceptionA
    k = iter(jax.random.split(key, 8))
    return {
        "b1x1": _bn_conv(next(k), 1, 1, cin, 64, dtype),
        "b5x5_1": _bn_conv(next(k), 1, 1, cin, 48, dtype),
        "b5x5_2": _bn_conv(next(k), 5, 5, 48, 64, dtype),
        "b3x3_1": _bn_conv(next(k), 1, 1, cin, 64, dtype),
        "b3x3_2": _bn_conv(next(k), 3, 3, 64, 96, dtype),
        "b3x3_3": _bn_conv(next(k), 3, 3, 96, 96, dtype),
        "pool": _bn_conv(next(k), 1, 1, cin, pool_ch, dtype),
    }


def _apply_mixed_a(p, x):
    b1 = _apply_bn_conv(p["b1x1"], x)
    b5 = _apply_bn_conv(p["b5x5_2"], _apply_bn_conv(p["b5x5_1"], x))
    b3 = _apply_bn_conv(p["b3x3_3"], _apply_bn_conv(p["b3x3_2"], _apply_bn_conv(p["b3x3_1"], x)))
    # FID quirk: count_include_pad=False
    bp = _apply_bn_conv(p["pool"], _avg_pool(x, count_include_pad=False))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _mixed_b(key, cin, dtype):  # InceptionB (reduction)
    k = iter(jax.random.split(key, 5))
    return {
        "b3x3": _bn_conv(next(k), 3, 3, cin, 384, dtype),
        "b3x3dbl_1": _bn_conv(next(k), 1, 1, cin, 64, dtype),
        "b3x3dbl_2": _bn_conv(next(k), 3, 3, 64, 96, dtype),
        "b3x3dbl_3": _bn_conv(next(k), 3, 3, 96, 96, dtype),
    }


def _apply_mixed_b(p, x):
    b3 = _apply_bn_conv(p["b3x3"], x, stride=2, padding="VALID")
    d = _apply_bn_conv(p["b3x3dbl_1"], x)
    d = _apply_bn_conv(p["b3x3dbl_2"], d)
    d = _apply_bn_conv(p["b3x3dbl_3"], d, stride=2, padding="VALID")
    mp = _max_pool(x)
    return jnp.concatenate([b3, d, mp], axis=-1)


def _mixed_c(key, cin, c7, dtype):  # InceptionC / FIDInceptionC
    k = iter(jax.random.split(key, 12))
    return {
        "b1x1": _bn_conv(next(k), 1, 1, cin, 192, dtype),
        "b7_1": _bn_conv(next(k), 1, 1, cin, c7, dtype),
        "b7_2": _bn_conv(next(k), 1, 7, c7, c7, dtype),
        "b7_3": _bn_conv(next(k), 7, 1, c7, 192, dtype),
        "b7d_1": _bn_conv(next(k), 1, 1, cin, c7, dtype),
        "b7d_2": _bn_conv(next(k), 7, 1, c7, c7, dtype),
        "b7d_3": _bn_conv(next(k), 1, 7, c7, c7, dtype),
        "b7d_4": _bn_conv(next(k), 7, 1, c7, c7, dtype),
        "b7d_5": _bn_conv(next(k), 1, 7, c7, 192, dtype),
        "pool": _bn_conv(next(k), 1, 1, cin, 192, dtype),
    }


def _apply_mixed_c(p, x):
    b1 = _apply_bn_conv(p["b1x1"], x)
    b7 = _apply_bn_conv(p["b7_3"], _apply_bn_conv(p["b7_2"], _apply_bn_conv(p["b7_1"], x)))
    d = x
    for name in ("b7d_1", "b7d_2", "b7d_3", "b7d_4", "b7d_5"):
        d = _apply_bn_conv(p[name], d)
    bp = _apply_bn_conv(p["pool"], _avg_pool(x, count_include_pad=False))
    return jnp.concatenate([b1, b7, d, bp], axis=-1)


def _mixed_d(key, cin, dtype):  # InceptionD (reduction)
    k = iter(jax.random.split(key, 7))
    return {
        "b3x3_1": _bn_conv(next(k), 1, 1, cin, 192, dtype),
        "b3x3_2": _bn_conv(next(k), 3, 3, 192, 320, dtype),
        "b7x7_1": _bn_conv(next(k), 1, 1, cin, 192, dtype),
        "b7x7_2": _bn_conv(next(k), 1, 7, 192, 192, dtype),
        "b7x7_3": _bn_conv(next(k), 7, 1, 192, 192, dtype),
        "b7x7_4": _bn_conv(next(k), 3, 3, 192, 192, dtype),
    }


def _apply_mixed_d(p, x):
    b3 = _apply_bn_conv(p["b3x3_2"], _apply_bn_conv(p["b3x3_1"], x), stride=2, padding="VALID")
    b7 = _apply_bn_conv(p["b7x7_1"], x)
    b7 = _apply_bn_conv(p["b7x7_2"], b7)
    b7 = _apply_bn_conv(p["b7x7_3"], b7)
    b7 = _apply_bn_conv(p["b7x7_4"], b7, stride=2, padding="VALID")
    mp = _max_pool(x)
    return jnp.concatenate([b3, b7, mp], axis=-1)


def _mixed_e(key, cin, dtype):  # InceptionE / FIDInceptionE_{1,2}
    k = iter(jax.random.split(key, 10))
    return {
        "b1x1": _bn_conv(next(k), 1, 1, cin, 320, dtype),
        "b3_1": _bn_conv(next(k), 1, 1, cin, 384, dtype),
        "b3_2a": _bn_conv(next(k), 1, 3, 384, 384, dtype),
        "b3_2b": _bn_conv(next(k), 3, 1, 384, 384, dtype),
        "b3d_1": _bn_conv(next(k), 1, 1, cin, 448, dtype),
        "b3d_2": _bn_conv(next(k), 3, 3, 448, 384, dtype),
        "b3d_3a": _bn_conv(next(k), 1, 3, 384, 384, dtype),
        "b3d_3b": _bn_conv(next(k), 3, 1, 384, 384, dtype),
        "pool": _bn_conv(next(k), 1, 1, cin, 192, dtype),
    }


def _apply_mixed_e(p, x, pool_kind: str):
    b1 = _apply_bn_conv(p["b1x1"], x)
    b3 = _apply_bn_conv(p["b3_1"], x)
    b3 = jnp.concatenate([_apply_bn_conv(p["b3_2a"], b3), _apply_bn_conv(p["b3_2b"], b3)], axis=-1)
    d = _apply_bn_conv(p["b3d_2"], _apply_bn_conv(p["b3d_1"], x))
    d = jnp.concatenate([_apply_bn_conv(p["b3d_3a"], d), _apply_bn_conv(p["b3d_3b"], d)], axis=-1)
    if pool_kind == "avg":  # FIDInceptionE_1: count_include_pad=False
        pooled = _avg_pool(x, count_include_pad=False)
    else:  # FIDInceptionE_2: *max* pooling (pytorch-fid quirk)
        pooled = _max_pool(x, window=3, stride=1, pad="SAME")
    bp = _apply_bn_conv(p["pool"], pooled)
    return jnp.concatenate([b1, b3, d, bp], axis=-1)


def init_inception_params(rng: jax.Array, cfg: InceptionConfig = InceptionConfig()) -> Params:
    d = cfg.dtype
    k = iter(jax.random.split(rng, 24))
    return {
        "stem1": _bn_conv(next(k), 3, 3, 3, 32, d),     # stride 2 valid
        "stem2": _bn_conv(next(k), 3, 3, 32, 32, d),    # valid
        "stem3": _bn_conv(next(k), 3, 3, 32, 64, d),    # same
        "stem4": _bn_conv(next(k), 1, 1, 64, 80, d),    # valid
        "stem5": _bn_conv(next(k), 3, 3, 80, 192, d),   # valid
        "mixed_5b": _mixed_a(next(k), 192, 32, d),
        "mixed_5c": _mixed_a(next(k), 256, 64, d),
        "mixed_5d": _mixed_a(next(k), 288, 64, d),
        "mixed_6a": _mixed_b(next(k), 288, d),
        "mixed_6b": _mixed_c(next(k), 768, 128, d),
        "mixed_6c": _mixed_c(next(k), 768, 160, d),
        "mixed_6d": _mixed_c(next(k), 768, 160, d),
        "mixed_6e": _mixed_c(next(k), 768, 192, d),
        "mixed_7a": _mixed_d(next(k), 768, d),
        "mixed_7b": _mixed_e(next(k), 1280, d),
        "mixed_7c": _mixed_e(next(k), 2048, d),
    }


def inception_pool3(params: Params, images: jnp.ndarray,
                    cfg: InceptionConfig = InceptionConfig()) -> jnp.ndarray:
    """[B, 299, 299, 3] in [0,1] → [B, 2048] pool3 activations."""
    x = images
    if x.shape[1] != 299:
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")
    if cfg.normalize_input:
        x = x * 2.0 - 1.0
    x = _apply_bn_conv(params["stem1"], x, stride=2, padding="VALID")
    x = _apply_bn_conv(params["stem2"], x, padding="VALID")
    x = _apply_bn_conv(params["stem3"], x)
    x = _max_pool(x)
    x = _apply_bn_conv(params["stem4"], x, padding="VALID")
    x = _apply_bn_conv(params["stem5"], x, padding="VALID")
    x = _max_pool(x)
    x = _apply_mixed_a(params["mixed_5b"], x)
    x = _apply_mixed_a(params["mixed_5c"], x)
    x = _apply_mixed_a(params["mixed_5d"], x)
    x = _apply_mixed_b(params["mixed_6a"], x)
    x = _apply_mixed_c(params["mixed_6b"], x)
    x = _apply_mixed_c(params["mixed_6c"], x)
    x = _apply_mixed_c(params["mixed_6d"], x)
    x = _apply_mixed_c(params["mixed_6e"], x)
    x = _apply_mixed_d(params["mixed_7a"], x)
    x = _apply_mixed_e(params["mixed_7b"], x, pool_kind="avg")
    x = _apply_mixed_e(params["mixed_7c"], x, pool_kind="max")
    return jnp.mean(x, axis=(1, 2))  # global avg pool → [B, 2048]


def compute_fid(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu1, s1 = activation_statistics(feats_a)
    mu2, s2 = activation_statistics(feats_b)
    return frechet_distance(mu1, s1, mu2, s2)


def compute_fid_against_stats(feats: np.ndarray, stats_npz: str) -> float:
    """FID vs a precomputed stats file (``fid_stats_mscoco256_val.npz``
    convention: arrays ``mu`` and ``sigma``)."""
    d = np.load(stats_npz)
    mu1, s1 = activation_statistics(feats)
    return frechet_distance(mu1, s1, d["mu"], d["sigma"])


def save_stats_npz(feats: np.ndarray, out_path: str):
    """Precompute a reference-statistics file from pool3 features
    (pytorch-fid's --save-stats equivalent)."""
    mu, sigma = activation_statistics(feats)
    np.savez(out_path, mu=mu, sigma=sigma)


def stats_from_image_dir(
    inception_params, image_dir: str, out_path: str, *,
    batch_size: int = 32, image_size: int = 256,
) -> str:
    """Walk a directory of images → pool3 features → stats npz (builds
    ``fid_stats_*`` files from a local COCO val dump)."""
    import os

    from PIL import Image

    paths = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if not paths:
        raise ValueError(f"no images under {image_dir}")
    # shared jitted extractor (module-level jit cache + ragged-tail padding —
    # avoids a second remote compile for the last partial batch)
    from dreamllm_tpu.eval.text2img import extract_inception_features

    feats = []
    for i in range(0, len(paths), batch_size):
        batch = []
        for p in paths[i : i + batch_size]:
            img = Image.open(p).convert("RGB").resize((image_size, image_size))
            batch.append(np.asarray(img, np.float32) / 255.0)
        x = np.stack(batch)
        n = x.shape[0]
        if n != batch_size and len(paths) > batch_size:
            # pad the ragged tail to the compiled batch shape
            x = np.pad(x, ((0, batch_size - n), (0, 0), (0, 0), (0, 0)))
        feats.append(extract_inception_features(
            inception_params, x, batch_size=batch_size)[:n])
    save_stats_npz(np.concatenate(feats), out_path)
    return out_path
