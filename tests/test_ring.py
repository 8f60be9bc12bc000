"""Ring attention over an 8-device CPU mesh vs single-device full attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.ops.attention import dot_product_attention
from dreamllm_tpu.parallel import MeshConfig, create_mesh
from dreamllm_tpu.parallel.ring import ring_self_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def make_qkv(b=2, s=64, hq=4, hkv=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    return q, k, v


class TestRingAttention:
    def test_causal_matches_full(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        q, k, v = make_qkv()
        ref = dot_product_attention(q, k, v, causal=True)
        got = ring_self_attention(q, k, v, mesh, axis="fsdp", causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_non_causal_matches_full(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        q, k, v = make_qkv(seed=1)
        ref = dot_product_attention(q, k, v, causal=False)
        got = ring_self_attention(q, k, v, mesh, axis="fsdp", causal=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_packed_segments(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        q, k, v = make_qkv(b=1, s=64, seed=2)
        seg = np.zeros((1, 64), np.int32)
        seg[0, :30] = 1
        seg[0, 30:50] = 2  # trailing 14 = padding (id 0)
        ref = dot_product_attention(q, k, v, causal=True, segment_ids=jnp.asarray(seg))
        got = ring_self_attention(q, k, v, mesh, axis="fsdp", causal=True,
                                  segment_ids=jnp.asarray(seg))
        valid = seg[0] != 0
        np.testing.assert_allclose(
            np.asarray(got)[0, valid], np.asarray(ref)[0, valid], rtol=2e-4, atol=2e-5
        )

    def test_grads_flow(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=8, tp=1))
        q, k, v = make_qkv(seed=3)

        def loss_ring(q, k, v):
            return jnp.sum(ring_self_attention(q, k, v, mesh, axis="fsdp") ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, causal=True) ** 2)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)
