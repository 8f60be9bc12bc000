"""Decoder backbone tests: logits parity vs transformers LlamaForCausalLM,
KV-cache decode consistency, packed-segment masking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dreamllm_tpu.convert import convert_llama_state_dict, llama_config_from_hf
from dreamllm_tpu.models import (
    LlamaConfig,
    init_kv_cache,
    init_llama_params,
    llama_forward,
    llama_logits,
)

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        **TINY,
        attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg)
    params = convert_llama_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


class TestHFParity:
    def test_logits_match_hf(self, hf_pair):
        hf, cfg, params = hf_pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, TINY["vocab_size"], size=(2, 17))
        with torch.no_grad():
            golden = hf(torch.from_numpy(ids)).logits.numpy()
        got = llama_logits(
            params, cfg,
            llama_forward(params, cfg, input_ids=jnp.asarray(ids), use_flash=False)[
                "last_hidden_state"
            ],
        )
        np.testing.assert_allclose(np.asarray(got), golden, rtol=2e-4, atol=2e-4)

    def test_kv_cache_decode_matches_full_forward(self, hf_pair):
        _, cfg, params = hf_pair
        rng = np.random.default_rng(1)
        b, s = 2, 12
        ids = jnp.asarray(rng.integers(0, TINY["vocab_size"], size=(b, s)))

        full = llama_forward(params, cfg, input_ids=ids, use_flash=False)[
            "last_hidden_state"
        ]

        cache = init_kv_cache(cfg, b, max_len=16, dtype=jnp.float32)
        # prefill on the first 8 tokens, then decode 4 single steps
        out = llama_forward(params, cfg, input_ids=ids[:, :8], kv_cache=cache, use_flash=False)
        states = [out["last_hidden_state"]]
        cache = out["kv_cache"]
        for t in range(8, s):
            out = llama_forward(params, cfg, input_ids=ids[:, t : t + 1], kv_cache=cache, use_flash=False)
            states.append(out["last_hidden_state"])
            cache = out["kv_cache"]
        stepped = jnp.concatenate(states, axis=1)
        np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), rtol=2e-4, atol=2e-4)
        assert int(cache["index"]) == s

    def test_inputs_embeds_path(self, hf_pair):
        """Multimodal splicing injects embeds directly — must equal id path."""
        _, cfg, params = hf_pair
        ids = jnp.asarray(np.arange(10)[None] % TINY["vocab_size"])
        via_ids = llama_forward(params, cfg, input_ids=ids, use_flash=False)
        embeds = jnp.take(params["embed_tokens"], ids, axis=0)
        via_embeds = llama_forward(params, cfg, inputs_embeds=embeds, use_flash=False)
        np.testing.assert_allclose(
            np.asarray(via_ids["last_hidden_state"]),
            np.asarray(via_embeds["last_hidden_state"]),
            rtol=1e-6, atol=1e-6,
        )


class TestSegments:
    def test_packed_sequences_equal_separate(self):
        """Two sequences packed with distinct segment ids must produce the
        same hidden states as running them separately."""
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(2)
        a = rng.integers(0, TINY["vocab_size"], size=(1, 6))
        c = rng.integers(0, TINY["vocab_size"], size=(1, 5))

        sep_a = llama_forward(params, cfg, input_ids=jnp.asarray(a), use_flash=False)[
            "last_hidden_state"
        ]
        sep_c = llama_forward(params, cfg, input_ids=jnp.asarray(c), use_flash=False)[
            "last_hidden_state"
        ]

        packed = np.concatenate([a, c, np.zeros((1, 3), np.int64)], axis=1)
        seg = np.array([[1] * 6 + [2] * 5 + [0] * 3])
        pos = np.array([list(range(6)) + list(range(5)) + [0] * 3])
        out = llama_forward(
            params, cfg,
            input_ids=jnp.asarray(packed),
            segment_ids=jnp.asarray(seg),
            positions=jnp.asarray(pos),
            use_flash=False,
        )["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(out[:, :6]), np.asarray(sep_a), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out[:, 6:11]), np.asarray(sep_c), rtol=2e-4, atol=2e-4)


class TestMisc:
    def test_remat_matches(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        ids = jnp.asarray(np.arange(8)[None])
        a = llama_forward(params, cfg, input_ids=ids, use_flash=False)["last_hidden_state"]
        b = llama_forward(params, cfg, input_ids=ids, use_flash=False, remat=True)[
            "last_hidden_state"
        ]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def test_remat_dots_policy_matches(self):
        # remat="dots" (save matmul outputs) must match no-remat in both the
        # forward values and the gradient.
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        ids = jnp.asarray(np.arange(8)[None])

        def loss(p, remat):
            h = llama_forward(p, cfg, input_ids=ids, use_flash=False, remat=remat)[
                "last_hidden_state"
            ]
            return jnp.mean(h.astype(jnp.float32) ** 2)

        (la, ga) = jax.value_and_grad(loss)(params, False)
        (lb, gb) = jax.value_and_grad(loss)(params, "dots")
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
        # grads match up to f32 reassociation noise at the loss's scale
        scale = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(ga))
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6 * max(scale, 1.0)
            ),
            ga, gb,
        )
        with pytest.raises(ValueError):
            llama_forward(params, cfg, input_ids=ids, use_flash=False, remat="typo")

    def test_output_hidden_states(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        ids = jnp.asarray(np.arange(8)[None])
        out = llama_forward(params, cfg, input_ids=ids, use_flash=False, output_hidden_states=True)
        assert out["hidden_states"].shape == (TINY["num_hidden_layers"] + 1, 1, 8, TINY["hidden_size"])

    def test_jit_forward(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        ids = jnp.asarray(np.arange(8)[None])

        @jax.jit
        def f(p, i):
            return llama_forward(p, cfg, input_ids=i, use_flash=False)["last_hidden_state"]

        np.testing.assert_allclose(
            np.asarray(f(params, ids)),
            np.asarray(llama_forward(params, cfg, input_ids=ids, use_flash=False)["last_hidden_state"]),
            rtol=1e-5, atol=1e-5,
        )


class TestVocabResize:
    """Vanilla-checkpoint bootstrap: grow a stock-vocab HF Llama to the
    framework vocab with mean-init rows (reference
    modeling_dreamllm.py:1310-1322 + projects/dreamllm/train.py:142-147)."""

    def test_mean_init_and_forward(self, hf_pair):
        from dreamllm_tpu.convert import resize_vocab_with_mean_init

        _, cfg, params = hf_pair
        new_vocab = TINY["vocab_size"] + 8
        p2, cfg2 = resize_vocab_with_mean_init(params, cfg, new_vocab)
        assert cfg2.vocab_size == new_vocab
        emb = np.asarray(p2["embed_tokens"], np.float32)
        assert emb.shape[0] == new_vocab
        old_mean = np.asarray(params["embed_tokens"], np.float32).mean(axis=0)
        for r in range(TINY["vocab_size"], new_vocab):
            np.testing.assert_allclose(emb[r], old_mean, rtol=1e-5, atol=1e-6)
        head = np.asarray(p2["lm_head"], np.float32)
        assert head.shape[1] == new_vocab
        head_mean = np.asarray(params["lm_head"], np.float32).mean(axis=1)
        np.testing.assert_allclose(head[:, -1], head_mean, rtol=1e-5, atol=1e-6)
        # old rows untouched
        np.testing.assert_array_equal(
            emb[: TINY["vocab_size"]], np.asarray(params["embed_tokens"])
        )
        # forward over a NEW token id works and produces full-width logits
        ids = jnp.asarray([[TINY["vocab_size"] + 3, 5, 7]])
        h = llama_forward(p2, cfg2, input_ids=ids, use_flash=False)["last_hidden_state"]
        logits = llama_logits(p2, cfg2, h)
        assert logits.shape == (1, 3, new_vocab)
        assert np.isfinite(np.asarray(logits)).all()

    def test_shrink_rejected(self, hf_pair):
        from dreamllm_tpu.convert import resize_vocab_with_mean_init

        _, cfg, params = hf_pair
        with pytest.raises(ValueError):
            resize_vocab_with_mean_init(params, cfg, TINY["vocab_size"] - 1)

    def test_train_smoke_step_after_resize(self, hf_pair):
        from dreamllm_tpu.convert import resize_vocab_with_mean_init
        from dreamllm_tpu.train import (
            OptimizerConfig, init_train_state, make_optimizer,
        )
        import optax

        _, cfg, params = hf_pair
        p2, cfg2 = resize_vocab_with_mean_init(params, cfg, TINY["vocab_size"] + 8)

        def loss_fn(p, ids):
            h = llama_forward(p, cfg2, input_ids=ids, use_flash=False)["last_hidden_state"]
            logits = llama_logits(p, cfg2, h)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], ids[:, 1:]
            ).mean()

        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10))
        state = init_train_state(p2, tx)
        ids = jnp.asarray([[1, 5, TINY["vocab_size"] + 2, 9, 3]])
        loss, grads = jax.value_and_grad(loss_fn)(state.params, ids)
        assert np.isfinite(float(loss))
        updates, _ = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # the new (mean-init) rows must be trainable: the row for the used
        # new token moved
        before = np.asarray(p2["embed_tokens"])[TINY["vocab_size"] + 2]
        after = np.asarray(new_params["embed_tokens"])[TINY["vocab_size"] + 2]
        assert np.abs(after - before).max() > 0


class TestPartialRemat:
    """remat=<int k>: first L-k layers dots-checkpointed, last k save-all
    (partial gradient checkpointing — spends leftover HBM on skipping
    recompute where all-or-nothing remat=False does not fit)."""

    def _loss(self, p, cfg, ids, remat):
        h = llama_forward(p, cfg, input_ids=ids, use_flash=False, remat=remat)[
            "last_hidden_state"]
        return jnp.mean(h.astype(jnp.float32) ** 2)

    def test_matches_full_remat_loss_and_grads(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        ids = jnp.asarray(np.arange(8)[None])
        la, ga = jax.value_and_grad(self._loss)(params, cfg, ids, True)
        scale = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(ga))
        for k in (0, 1, cfg.num_hidden_layers):
            lb, gb = jax.value_and_grad(self._loss)(params, cfg, ids, k)
            np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
            jax.tree.map(
                lambda x, y: np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=1e-4,
                    atol=2e-6 * max(scale, 1.0)),
                ga, gb,
            )

    def test_split_scan_hidden_states_and_stats(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        ids = jnp.asarray(np.arange(8)[None])
        out = llama_forward(params, cfg, input_ids=ids, use_flash=False,
                            remat=1, output_hidden_states=True, output_stats=True)
        ref = llama_forward(params, cfg, input_ids=ids, use_flash=False,
                            output_hidden_states=True, output_stats=True)
        L = cfg.num_hidden_layers
        assert out["hidden_states"].shape[0] == L + 1
        assert out["layer_absmax"].shape == (L,)
        np.testing.assert_allclose(np.asarray(out["hidden_states"]),
                                   np.asarray(ref["hidden_states"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["layer_absmax"]),
                                   np.asarray(ref["layer_absmax"]),
                                   rtol=1e-5, atol=1e-6)

    def test_out_of_range_raises(self):
        cfg = LlamaConfig(**TINY)
        params = init_llama_params(jax.random.PRNGKey(1), cfg)
        ids = jnp.asarray(np.arange(8)[None])
        with pytest.raises(ValueError):
            llama_forward(params, cfg, input_ids=ids, use_flash=False,
                          remat=cfg.num_hidden_layers + 1)
