"""Per-layer gradient scaling: trailing-layer partial unfreeze and LLRD over
scan-stacked params."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.train.optim import (
    OptimizerConfig,
    _decay_mask,
    layerwise_multiplier_tree,
    llrd_multiplier,
    make_optimizer,
    scale_grads_by_tree,
    trailing_layers_multiplier,
)


def test_decay_mask_excludes_stacked_norms_and_biases():
    """Weight decay must skip norm scales/biases even when scan-stacking
    makes them rank-2 [L, h] (llama input_norm, CLIP ln*/b* leaves)."""
    params = {
        "llm": {
            "embed_tokens": jnp.ones((10, 4)),
            "layers": {
                "wq": jnp.ones((2, 4, 4)),
                "input_norm": jnp.ones((2, 4)),       # stacked norm: rank 2!
                "post_attn_norm": jnp.ones((2, 4)),
            },
            "final_norm": jnp.ones((4,)),
        },
        "clip": {
            "layers": {
                "ln1_w": jnp.ones((2, 4)), "ln1_b": jnp.ones((2, 4)),
                "bq": jnp.ones((2, 4)), "fc1_b": jnp.ones((2, 8)),
                "fc1_w": jnp.ones((2, 4, 8)),
            },
        },
        "sd_head": {"norm1": {"w": jnp.ones((8,)), "b": jnp.ones((8,))},
                    "conv": {"w": jnp.ones((3, 3, 4, 4)), "b": jnp.ones((4,))}},
    }
    m = _decay_mask(params)
    assert m["llm"]["embed_tokens"] is True
    assert m["llm"]["layers"]["wq"] is True
    assert m["llm"]["layers"]["input_norm"] is False
    assert m["llm"]["layers"]["post_attn_norm"] is False
    assert m["llm"]["final_norm"] is False
    assert m["clip"]["layers"]["ln1_w"] is False
    assert m["clip"]["layers"]["ln1_b"] is False
    assert m["clip"]["layers"]["bq"] is False
    assert m["clip"]["layers"]["fc1_b"] is False
    assert m["clip"]["layers"]["fc1_w"] is True
    assert m["sd_head"]["norm1"]["w"] is False
    assert m["sd_head"]["conv"]["w"] is True
    assert m["sd_head"]["conv"]["b"] is False


def test_trailing_multiplier():
    m = np.asarray(trailing_layers_multiplier(4, 2))
    np.testing.assert_array_equal(m, [0, 0, 1, 1])


def test_llrd_multiplier():
    m = np.asarray(llrd_multiplier(3, 0.5))
    np.testing.assert_allclose(m, [0.25, 0.5, 1.0])


def test_scale_grads_broadcasts_leading_axis():
    params = {"layers": {"w": jnp.ones((3, 2, 2)), "b": jnp.ones((3, 2))},
              "other": jnp.ones((5,))}
    mult = layerwise_multiplier_tree(params, {"layers": jnp.asarray([0.0, 0.5, 1.0])})
    assert mult["other"] is None
    tx = scale_grads_by_tree(mult)
    grads = jax.tree.map(jnp.ones_like, params)
    out, _ = tx.update(grads, tx.init(params))
    np.testing.assert_allclose(np.asarray(out["layers"]["w"][0]), 0.0)
    np.testing.assert_allclose(np.asarray(out["layers"]["w"][1]), 0.5)
    np.testing.assert_allclose(np.asarray(out["layers"]["b"][2]), 1.0)
    np.testing.assert_allclose(np.asarray(out["other"]), 1.0)


def test_partial_unfreeze_in_full_optimizer():
    """Leading layers of a stacked tensor stay EXACTLY unchanged through a
    real AdamW update."""
    params = {"layers": {"w": jnp.ones((4, 3, 3))}}
    mult = layerwise_multiplier_tree(
        params, {"layers": trailing_layers_multiplier(4, 1)}
    )
    tx = make_optimizer(
        OptimizerConfig(learning_rate=0.1, schedule="constant", warmup_steps=0,
                        total_steps=10, max_grad_norm=0.0),
        grad_multipliers=mult,
    )
    state = tx.init(params)
    grads = {"layers": {"w": jnp.ones((4, 3, 3))}}
    updates, _ = tx.update(grads, state, params)
    u = np.asarray(updates["layers"]["w"])
    np.testing.assert_allclose(u[:3], 0.0, atol=1e-9)  # frozen layers untouched
    assert np.all(np.abs(u[3]) > 0)


def test_llrd_scales_realized_adam_updates():
    """Regression: pre-Adam gradient scaling cancels in mu/(sqrt(nu)+eps);
    the multiplier must scale the realized UPDATE per layer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dreamllm_tpu.train.optim import (
        OptimizerConfig,
        layerwise_multiplier_tree,
        llrd_multiplier,
        make_optimizer,
    )

    L = 4
    params = {"layers": {"w": jnp.ones((L, 8, 8))}}
    mult = layerwise_multiplier_tree(params, {"layers": llrd_multiplier(L, 0.5)})
    cfg = OptimizerConfig(learning_rate=1e-2, warmup_steps=0, total_steps=10,
                          schedule="constant", weight_decay=0.0)
    tx = make_optimizer(cfg, grad_multipliers=mult)
    state = tx.init(params)
    grads = {"layers": {"w": jnp.full((L, 8, 8), 0.3)}}
    updates, _ = tx.update(grads, state, params)
    per_layer = np.abs(np.asarray(updates["layers"]["w"])).mean(axis=(1, 2))
    # top layer moves 1.0x, each earlier layer half of the next
    ratios = per_layer[:-1] / per_layer[1:]
    np.testing.assert_allclose(ratios, 0.5, rtol=1e-3)


def test_zero_multiplier_blocks_weight_decay():
    """Regression: a 0 multiplier must stop the decoupled weight-decay term
    too — frozen layers may not drift toward zero."""
    import jax.numpy as jnp
    import numpy as np

    from dreamllm_tpu.train.optim import (
        OptimizerConfig,
        layerwise_multiplier_tree,
        make_optimizer,
        trailing_layers_multiplier,
    )

    L = 4
    params = {"layers": {"w": jnp.ones((L, 8, 8))}}
    mult = layerwise_multiplier_tree(
        params, {"layers": trailing_layers_multiplier(L, 1)}
    )
    cfg = OptimizerConfig(learning_rate=1e-2, warmup_steps=0, total_steps=10,
                          schedule="constant", weight_decay=0.1)
    tx = make_optimizer(cfg, grad_multipliers=mult)
    state = tx.init(params)
    grads = {"layers": {"w": jnp.full((L, 8, 8), 0.3)}}
    updates, _ = tx.update(grads, state, params)
    u = np.asarray(updates["layers"]["w"])
    np.testing.assert_allclose(u[:-1], 0.0)   # frozen layers: NO update at all
    assert np.abs(u[-1]).mean() > 0
