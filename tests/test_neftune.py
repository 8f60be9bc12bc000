"""NEFTune noisy-embedding tuning — parity with the reference formula
(omni/train/trainer_utils.py:106-130 neftune_post_forward_hook): uniform
noise U(-mag, +mag) with mag = alpha / sqrt(S·H) added to the token
embedding lookup during training only; spliced spans are not noised (the
reference hooks only nn.Embedding, and splicing overwrites its output)."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.dreamllm import (
    dreamllm_forward,
    init_dreamllm_params,
    multimodal_embed,
)
from tests.test_dreamllm import make_batch, tiny_cfg

ALPHA = 5.0


def _model():
    cfg = tiny_cfg(neftune_noise_alpha=ALPHA)
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestNeftune:
    def test_noise_magnitude_matches_reference_formula(self):
        cfg, params = _model()
        batch = make_batch(cfg)
        clean = multimodal_embed(params, cfg, batch["input_ids"])
        noisy = multimodal_embed(
            params, cfg, batch["input_ids"], neftune_rng=jax.random.PRNGKey(7)
        )
        b, s, h = clean.shape
        mag = ALPHA / np.sqrt(s * h)  # reference: alpha / sqrt(dims), dims = S*H
        d = np.asarray(noisy - clean)
        assert np.abs(d).max() <= mag + 1e-6
        assert np.abs(d).max() > 0.5 * mag          # actually uniform-wide
        assert abs(d.mean()) < 0.1 * mag             # centered
        assert (np.abs(d) > 1e-9).mean() > 0.99      # noise everywhere

    def test_spliced_spans_not_noised(self):
        cfg, params = _model()
        batch = make_batch(cfg)
        noisy = multimodal_embed(
            params, cfg, batch["input_ids"],
            images=batch["images"],
            image_positions=batch["image_positions"],
            dream_positions=batch["dream_positions"],
            neftune_rng=jax.random.PRNGKey(7),
        )
        # dream span equals the learned queries exactly — splice after noise
        q = np.asarray(params["dream_embedding"]["queries"])
        np.testing.assert_allclose(np.asarray(noisy)[0, 8:12], q, rtol=1e-6)

    def test_off_without_rng_and_off_by_default(self):
        cfg, params = _model()
        batch = make_batch(cfg)
        a = multimodal_embed(params, cfg, batch["input_ids"])  # eval path
        t = jnp.take(params["llm"]["embed_tokens"], batch["input_ids"], axis=0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), rtol=1e-6)
        cfg0 = tiny_cfg()  # alpha unset
        params0 = init_dreamllm_params(jax.random.PRNGKey(0), cfg0)
        b = multimodal_embed(params0, cfg0, batch["input_ids"],
                             neftune_rng=jax.random.PRNGKey(7))
        t0 = jnp.take(params0["llm"]["embed_tokens"], batch["input_ids"], axis=0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(t0), rtol=1e-6)

    def test_training_forward_applies_noise_deterministically(self):
        cfg, params = _model()
        batch = make_batch(cfg)
        l1, _ = dreamllm_forward(params, cfg, batch, rng=jax.random.PRNGKey(3))
        l2, _ = dreamllm_forward(params, cfg, batch, rng=jax.random.PRNGKey(3))
        l3, _ = dreamllm_forward(params, cfg, batch, rng=jax.random.PRNGKey(4))
        assert float(l1) == float(l2)       # same rng -> same noise
        assert float(l1) != float(l3)       # different rng -> different noise
        cfg0 = tiny_cfg()
        l0, _ = dreamllm_forward(params, cfg0, batch, rng=jax.random.PRNGKey(3))
        assert float(l0) != float(l1)       # alpha changes the loss
