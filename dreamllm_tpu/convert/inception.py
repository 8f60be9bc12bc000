"""torchvision/pytorch-fid InceptionV3 state_dict → eval/fid param pytree.

Weights source: pytorch-fid's ``pt_inception-2015-12-05`` checkpoint (or
torchvision ``inception_v3``) — the reference's FID backbone
(third_party/pytorch-fid/src/pytorch_fid/inception.py). BatchNorms are folded
into (scale, bias) at conversion time since FID inference never trains:

    scale = gamma / sqrt(var + eps),  bias = beta - mean·scale
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

_EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _bn_conv(sd: Mapping, prefix: str, dtype) -> dict:
    w = _to_np(sd[prefix + ".conv.weight"])          # [out,in,kh,kw]
    gamma = _to_np(sd[prefix + ".bn.weight"])
    beta = _to_np(sd[prefix + ".bn.bias"])
    mean = _to_np(sd[prefix + ".bn.running_mean"])
    var = _to_np(sd[prefix + ".bn.running_var"])
    scale = gamma / np.sqrt(var + _EPS)
    bias = beta - mean * scale
    return {
        "conv": {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
            "b": jnp.zeros((w.shape[0],), dtype),
        },
        "bn_scale": jnp.asarray(scale, dtype),
        "bn_bias": jnp.asarray(bias, dtype),
    }


def _mixed_a(sd, p, dtype):
    return {
        "b1x1": _bn_conv(sd, p + ".branch1x1", dtype),
        "b5x5_1": _bn_conv(sd, p + ".branch5x5_1", dtype),
        "b5x5_2": _bn_conv(sd, p + ".branch5x5_2", dtype),
        "b3x3_1": _bn_conv(sd, p + ".branch3x3dbl_1", dtype),
        "b3x3_2": _bn_conv(sd, p + ".branch3x3dbl_2", dtype),
        "b3x3_3": _bn_conv(sd, p + ".branch3x3dbl_3", dtype),
        "pool": _bn_conv(sd, p + ".branch_pool", dtype),
    }


def _mixed_b(sd, p, dtype):
    return {
        "b3x3": _bn_conv(sd, p + ".branch3x3", dtype),
        "b3x3dbl_1": _bn_conv(sd, p + ".branch3x3dbl_1", dtype),
        "b3x3dbl_2": _bn_conv(sd, p + ".branch3x3dbl_2", dtype),
        "b3x3dbl_3": _bn_conv(sd, p + ".branch3x3dbl_3", dtype),
    }


def _mixed_c(sd, p, dtype):
    return {
        "b1x1": _bn_conv(sd, p + ".branch1x1", dtype),
        "b7_1": _bn_conv(sd, p + ".branch7x7_1", dtype),
        "b7_2": _bn_conv(sd, p + ".branch7x7_2", dtype),
        "b7_3": _bn_conv(sd, p + ".branch7x7_3", dtype),
        "b7d_1": _bn_conv(sd, p + ".branch7x7dbl_1", dtype),
        "b7d_2": _bn_conv(sd, p + ".branch7x7dbl_2", dtype),
        "b7d_3": _bn_conv(sd, p + ".branch7x7dbl_3", dtype),
        "b7d_4": _bn_conv(sd, p + ".branch7x7dbl_4", dtype),
        "b7d_5": _bn_conv(sd, p + ".branch7x7dbl_5", dtype),
        "pool": _bn_conv(sd, p + ".branch_pool", dtype),
    }


def _mixed_d(sd, p, dtype):
    return {
        "b3x3_1": _bn_conv(sd, p + ".branch3x3_1", dtype),
        "b3x3_2": _bn_conv(sd, p + ".branch3x3_2", dtype),
        "b7x7_1": _bn_conv(sd, p + ".branch7x7x3_1", dtype),
        "b7x7_2": _bn_conv(sd, p + ".branch7x7x3_2", dtype),
        "b7x7_3": _bn_conv(sd, p + ".branch7x7x3_3", dtype),
        "b7x7_4": _bn_conv(sd, p + ".branch7x7x3_4", dtype),
    }


def _mixed_e(sd, p, dtype):
    return {
        "b1x1": _bn_conv(sd, p + ".branch1x1", dtype),
        "b3_1": _bn_conv(sd, p + ".branch3x3_1", dtype),
        "b3_2a": _bn_conv(sd, p + ".branch3x3_2a", dtype),
        "b3_2b": _bn_conv(sd, p + ".branch3x3_2b", dtype),
        "b3d_1": _bn_conv(sd, p + ".branch3x3dbl_1", dtype),
        "b3d_2": _bn_conv(sd, p + ".branch3x3dbl_2", dtype),
        "b3d_3a": _bn_conv(sd, p + ".branch3x3dbl_3a", dtype),
        "b3d_3b": _bn_conv(sd, p + ".branch3x3dbl_3b", dtype),
        "pool": _bn_conv(sd, p + ".branch_pool", dtype),
    }


def export_inception_state_dict(params: dict) -> dict:
    """Inverse (for round-trip tests): emits torchvision-style names with
    identity-equivalent BN stats (mean=0, var=1-eps, gamma=scale, beta=bias)."""
    out: dict = {}

    def put(prefix, p):
        w = np.transpose(np.asarray(p["conv"]["w"], np.float32), (3, 2, 0, 1))
        cout = w.shape[0]
        out[prefix + ".conv.weight"] = w
        out[prefix + ".bn.weight"] = np.asarray(p["bn_scale"], np.float32)
        out[prefix + ".bn.bias"] = np.asarray(p["bn_bias"], np.float32)
        out[prefix + ".bn.running_mean"] = np.zeros((cout,), np.float32)
        out[prefix + ".bn.running_var"] = np.full((cout,), 1.0 - _EPS, np.float32)

    naming = {
        "stem1": "Conv2d_1a_3x3", "stem2": "Conv2d_2a_3x3", "stem3": "Conv2d_2b_3x3",
        "stem4": "Conv2d_3b_1x1", "stem5": "Conv2d_4a_3x3",
    }
    for ours, theirs in naming.items():
        put(theirs, params[ours])

    branch_names = {
        # ours -> torchvision branch names per block family
        "a": {"b1x1": "branch1x1", "b5x5_1": "branch5x5_1", "b5x5_2": "branch5x5_2",
              "b3x3_1": "branch3x3dbl_1", "b3x3_2": "branch3x3dbl_2",
              "b3x3_3": "branch3x3dbl_3", "pool": "branch_pool"},
        "b": {"b3x3": "branch3x3", "b3x3dbl_1": "branch3x3dbl_1",
              "b3x3dbl_2": "branch3x3dbl_2", "b3x3dbl_3": "branch3x3dbl_3"},
        "c": {"b1x1": "branch1x1", "b7_1": "branch7x7_1", "b7_2": "branch7x7_2",
              "b7_3": "branch7x7_3", "b7d_1": "branch7x7dbl_1", "b7d_2": "branch7x7dbl_2",
              "b7d_3": "branch7x7dbl_3", "b7d_4": "branch7x7dbl_4",
              "b7d_5": "branch7x7dbl_5", "pool": "branch_pool"},
        "d": {"b3x3_1": "branch3x3_1", "b3x3_2": "branch3x3_2",
              "b7x7_1": "branch7x7x3_1", "b7x7_2": "branch7x7x3_2",
              "b7x7_3": "branch7x7x3_3", "b7x7_4": "branch7x7x3_4"},
        "e": {"b1x1": "branch1x1", "b3_1": "branch3x3_1", "b3_2a": "branch3x3_2a",
              "b3_2b": "branch3x3_2b", "b3d_1": "branch3x3dbl_1", "b3d_2": "branch3x3dbl_2",
              "b3d_3a": "branch3x3dbl_3a", "b3d_3b": "branch3x3dbl_3b",
              "pool": "branch_pool"},
    }
    families = {
        "mixed_5b": "a", "mixed_5c": "a", "mixed_5d": "a",
        "mixed_6a": "b",
        "mixed_6b": "c", "mixed_6c": "c", "mixed_6d": "c", "mixed_6e": "c",
        "mixed_7a": "d",
        "mixed_7b": "e", "mixed_7c": "e",
    }
    for ours, fam in families.items():
        theirs = ours.replace("mixed_", "Mixed_")
        for bk, bv in branch_names[fam].items():
            put(f"{theirs}.{bv}", params[ours][bk])
    return out


def convert_inception_state_dict(state_dict: Mapping[str, Any], dtype=jnp.float32) -> dict:
    sd = dict(state_dict)
    return {
        "stem1": _bn_conv(sd, "Conv2d_1a_3x3", dtype),
        "stem2": _bn_conv(sd, "Conv2d_2a_3x3", dtype),
        "stem3": _bn_conv(sd, "Conv2d_2b_3x3", dtype),
        "stem4": _bn_conv(sd, "Conv2d_3b_1x1", dtype),
        "stem5": _bn_conv(sd, "Conv2d_4a_3x3", dtype),
        "mixed_5b": _mixed_a(sd, "Mixed_5b", dtype),
        "mixed_5c": _mixed_a(sd, "Mixed_5c", dtype),
        "mixed_5d": _mixed_a(sd, "Mixed_5d", dtype),
        "mixed_6a": _mixed_b(sd, "Mixed_6a", dtype),
        "mixed_6b": _mixed_c(sd, "Mixed_6b", dtype),
        "mixed_6c": _mixed_c(sd, "Mixed_6c", dtype),
        "mixed_6d": _mixed_c(sd, "Mixed_6d", dtype),
        "mixed_6e": _mixed_c(sd, "Mixed_6e", dtype),
        "mixed_7a": _mixed_d(sd, "Mixed_7a", dtype),
        "mixed_7b": _mixed_e(sd, "Mixed_7b", dtype),
        "mixed_7c": _mixed_e(sd, "Mixed_7c", dtype),
    }
