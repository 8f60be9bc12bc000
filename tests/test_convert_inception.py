"""Inception converter round-trip: our params → torchvision-style state dict
→ convert back → identical pool3 activations."""

import pytest

pytestmark = pytest.mark.slow  # full-suite only; fast tier: -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.convert.inception import (
    convert_inception_state_dict,
    export_inception_state_dict,
)
from dreamllm_tpu.eval.fid import init_inception_params, inception_pool3


def test_roundtrip_activations_match():
    params = init_inception_params(jax.random.PRNGKey(0))
    sd = export_inception_state_dict(params)
    # torchvision naming spot checks
    assert "Conv2d_1a_3x3.conv.weight" in sd
    assert "Mixed_5b.branch5x5_2.bn.running_var" in sd
    assert "Mixed_7a.branch7x7x3_4.conv.weight" in sd
    assert "Mixed_7c.branch3x3dbl_3b.bn.weight" in sd
    back = convert_inception_state_dict(sd)
    x = jnp.asarray(np.random.default_rng(0).random((1, 299, 299, 3)), jnp.float32)
    a = inception_pool3(params, x)
    b = inception_pool3(back, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_bn_folding_math():
    """Folded (scale,bias) must equal gamma/sqrt(var+eps), beta - mean*scale."""
    sd = {
        "X.conv.weight": np.ones((4, 3, 1, 1), np.float32),
        "X.bn.weight": np.full((4,), 2.0, np.float32),
        "X.bn.bias": np.full((4,), 1.0, np.float32),
        "X.bn.running_mean": np.full((4,), 0.5, np.float32),
        "X.bn.running_var": np.full((4,), 4.0, np.float32),
    }
    from dreamllm_tpu.convert.inception import _bn_conv

    p = _bn_conv(sd, "X", jnp.float32)
    scale = 2.0 / np.sqrt(4.0 + 1e-3)
    np.testing.assert_allclose(np.asarray(p["bn_scale"]), scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["bn_bias"]), 1.0 - 0.5 * scale, rtol=1e-6)
