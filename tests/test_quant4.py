"""int4 grouped weight quantization + Pallas w4a16 matmul (ops/quant4.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.ops.quant import matmul as qmm
from dreamllm_tpu.ops.quant4 import (
    GROUP,
    Q4Tensor,
    dequantize_int4,
    quantize_int4,
    quantize_llama_params_int4,
    w4_matmul,
)


def _w(k, n, seed=0, lead=()):
    return jax.random.normal(jax.random.PRNGKey(seed), (*lead, k, n), jnp.float32) * 0.02


def test_quantize_roundtrip_fidelity():
    w = _w(512, 256)
    t = quantize_int4(w)
    assert t.packed.shape == (256, 256) and t.packed.dtype == jnp.uint8
    assert t.scale.shape == (512 // GROUP, 256)
    deq = dequantize_int4(t, jnp.float32)
    # int4 g128 RTN: worst-case error is scale/2 = amax/14 per group
    wf = np.asarray(w).reshape(-1, GROUP, 256)
    amax = np.abs(wf).max(1)
    err = np.abs(np.asarray(deq).reshape(-1, GROUP, 256) - wf).max(1)
    assert (err <= amax / 14 + 1e-7).all()
    # cosine similarity stays high
    a, b = np.asarray(w).ravel(), np.asarray(deq).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99


def test_quantize_stacked_layers():
    w = _w(256, 128, lead=(3,))
    t = quantize_int4(w)
    assert t.packed.shape == (3, 128, 128)
    assert t.scale.shape == (3, 2, 128)
    # scan-slicing a layer keeps a valid 2-D Q4Tensor
    sl = jax.tree.map(lambda x: x[1], t)
    deq_all = dequantize_int4(t, jnp.float32)
    deq_sl = dequantize_int4(sl, jnp.float32)
    np.testing.assert_allclose(np.asarray(deq_all[1]), np.asarray(deq_sl))


def test_w4_matmul_kernel_matches_dequant():
    k, n, b = 512, 512, 4
    w = _w(k, n)
    t = quantize_int4(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, k), jnp.bfloat16)
    ref = x @ dequantize_int4(t, jnp.bfloat16)
    out = w4_matmul(x, t, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_w4_matmul_batch1():
    k, n = 1024, 512
    t = quantize_int4(_w(k, n, seed=2))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, k), jnp.bfloat16)
    out = w4_matmul(x, t, interpret=True)
    ref = x @ dequantize_int4(t, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_w4_matmul_lm_head_width():
    # N = 1664 (13*128) is not 512-divisible: exercises the adaptive column
    # block (the real case is the 32000-wide LM head)
    k, n = 512, 1664
    t = quantize_int4(_w(k, n, seed=5))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, k), jnp.bfloat16)
    out = w4_matmul(x, t, interpret=True)
    ref = x @ dequantize_int4(t, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_qmm_dispatch_and_fallback():
    # 3-D activations route through reshape; odd shapes fall back to dequant
    k, n = 512, 512
    t = quantize_int4(_w(k, n))
    x3 = jax.random.normal(jax.random.PRNGKey(4), (2, 3, k), jnp.bfloat16)
    out = qmm(x3, t)
    assert out.shape == (2, 3, n)
    ref = x3 @ dequantize_int4(t, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_int4_llama_decode_end_to_end():
    """Greedy decode with int4 params stays close to bf16: same first tokens
    on an easy distribution, finite logits, correct shapes."""
    from dreamllm_tpu.generation import SamplingConfig, generate_text
    from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, dtype=jnp.float32,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    q = quantize_llama_params_int4(params)
    assert isinstance(q["layers"]["wq"], Q4Tensor)
    assert isinstance(q["lm_head"], Q4Tensor)
    ids = jnp.asarray([[1, 5, 9, 13]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    scfg = SamplingConfig(greedy=True, max_new_tokens=8, eos_token_id=-1)
    out = generate_text(q, cfg, ids, lens, scfg)
    assert int(out["steps"]) == 8
    toks = np.asarray(out["tokens"][0])
    assert ((toks >= 0) & (toks < 256)).all()


def test_quantize_rejects_bad_k():
    with pytest.raises(AssertionError):
        quantize_int4(_w(300, 128))


def test_lora_tensor_over_int4_base():
    """LoRATensor with a Q4Tensor base: the QLoRA matmul adds the rank-r
    path on top of the int4 dequant path."""
    import jax

    from dreamllm_tpu.ops.quant import LoRATensor, matmul
    from dreamllm_tpu.ops.quant4 import quantize_int4

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    q4 = quantize_int4(w)
    a = jnp.asarray(rng.standard_normal((256, 4)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((4, 128)) * 0.1, jnp.float32)
    lt = LoRATensor(base=q4, a=a, b=b, scale=2.0)
    assert lt.shape == (256, 128)
    x = jnp.asarray(rng.standard_normal((3, 256)), jnp.bfloat16)
    got = jax.jit(matmul)(x, lt)
    ref = matmul(x, q4) + ((x @ a.astype(x.dtype)) @ b.astype(x.dtype)) * 2.0
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)
