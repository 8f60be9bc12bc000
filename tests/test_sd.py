"""SD stack tests: scheduler math vs closed form, VAE/UNet shapes and
round-trips, head loss + pipeline end-to-end on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-suite only; fast tier: -m 'not slow'

from dreamllm_tpu.models.projector import ProjectorConfig
from dreamllm_tpu.models.sd import (
    UNetConfig,
    VAEConfig,
    add_noise,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    dpm_solver_step,
    get_velocity,
    init_unet_params,
    init_vae_params,
    make_schedule,
    unet_forward,
    vae_decode,
    vae_encode,
    vae_sample,
)
from dreamllm_tpu.models.sd.head import SDHeadConfig, init_sd_head_params, sd_head_loss, sd_head_pipeline
from dreamllm_tpu.models.sd.schedulers import pred_x0_eps, rescale_noise_cfg, snr
from dreamllm_tpu.models.sd.unet import sdxl_unet_config


class TestSchedule:
    def test_scaled_linear_betas_match_diffusers_formula(self):
        s = make_schedule(num_train_timesteps=1000)
        betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
        np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
        )

    def test_add_noise_closed_form(self):
        s = make_schedule()
        x0 = jnp.ones((2, 4, 4, 1))
        noise = jnp.full((2, 4, 4, 1), 2.0)
        t = jnp.asarray([0, 999])
        out = add_noise(s, x0, noise, t)
        acp = np.asarray(s.alphas_cumprod)
        for i, ti in enumerate([0, 999]):
            expected = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 2.0
            np.testing.assert_allclose(np.asarray(out[i, 0, 0, 0]), expected, rtol=1e-5)

    def test_velocity_identity(self):
        """x0 and eps must be exactly recoverable from v."""
        s = make_schedule(prediction_type="v_prediction")
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)), jnp.float32)
        noise = jnp.asarray(rng.standard_normal((2, 4, 4, 1)), jnp.float32)
        t = jnp.asarray([100, 700])
        xt = add_noise(s, x0, noise, t)
        v = get_velocity(s, x0, noise, t)
        x0_rec, eps_rec = pred_x0_eps(s, v, xt, t)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), rtol=1e-4, atol=1e-5)

    def test_ddim_timesteps_leading_spacing(self):
        ts = np.asarray(ddim_timesteps(1000, 50))
        assert ts.shape == (50,)
        assert ts[0] == 981 and ts[-1] == 1  # 980+offset, 0+offset
        assert np.all(np.diff(ts) == -20)

    def test_ddim_perfect_model_recovers_x0(self):
        """With a model that returns the exact noise, DDIM must walk back to x0."""
        s = make_schedule()
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
        noise = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
        ts = ddim_timesteps(1000, 50)
        t0 = jnp.broadcast_to(ts[0], (1,))
        xt = add_noise(s, x0, noise, t0)
        # exact eps at every step: eps stays `noise` along the DDIM ODE when
        # the model is perfect
        for i in range(50):
            t = jnp.broadcast_to(ts[i], (1,))
            tp = jnp.broadcast_to(ts[i + 1] if i + 1 < 50 else -1, (1,))
            xt = ddim_step(s, noise, t, tp, xt)
        # diffusers SD configs use set_alpha_to_one=False: the final state is
        # sqrt(acp[0])*x0 + sqrt(1-acp[0])*eps, not x0 exactly
        a0 = np.asarray(s.alphas_cumprod[0])
        expect = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(noise)
        np.testing.assert_allclose(np.asarray(xt), expect, rtol=1e-3, atol=1e-3)

    def test_dpm_perfect_model_recovers_x0(self):
        s = make_schedule()
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
        noise = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
        ts = ddim_timesteps(1000, 20)
        xt = add_noise(s, x0, noise, jnp.broadcast_to(ts[0], (1,)))
        last_x0, t_last = None, None
        for i in range(20):
            t = jnp.broadcast_to(ts[i], (1,))
            tp = jnp.broadcast_to(ts[i + 1] if i + 1 < 20 else -1, (1,))
            xt, x0_pred = dpm_solver_step(s, noise, t, tp, xt, last_x0, t_last)
            last_x0, t_last = x0_pred, t
        np.testing.assert_allclose(np.asarray(xt), np.asarray(x0), rtol=1e-2, atol=1e-2)

    def test_ddpm_step_t0_returns_mean(self):
        s = make_schedule()
        x0 = jnp.ones((1, 2, 2, 1))
        noise = jnp.zeros((1, 2, 2, 1))
        t = jnp.asarray([0])
        xt = add_noise(s, x0, noise, t)
        out = ddpm_step(s, noise, t, xt, jax.random.PRNGKey(0))
        # at t=0 with exact eps, the posterior mean is x0 and variance is 0
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4, atol=1e-5)

    def test_snr_and_rescale(self):
        s = make_schedule()
        v = np.asarray(snr(s, jnp.asarray([0, 500, 999])))
        assert v[0] > v[1] > v[2] > 0
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 1)), jnp.float32)
        assert np.allclose(np.asarray(rescale_noise_cfg(x, x, 0.0)), np.asarray(x))
        y = rescale_noise_cfg(2.0 * x, x, 1.0)
        np.testing.assert_allclose(
            np.std(np.asarray(y), axis=(1, 2, 3)), np.std(np.asarray(x), axis=(1, 2, 3)), rtol=1e-4
        )


TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4, latent_channels=4)
TINY_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 4),
    cross_attention_dim=24,
    norm_num_groups=4,
)


class TestVAE:
    def test_encode_decode_shapes(self):
        params = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
        x = jnp.zeros((2, 16, 16, 3))
        mean, logvar = vae_encode(params, TINY_VAE, x)
        assert mean.shape == (2, 8, 8, 4)  # one downsample (2 blocks)
        z = vae_sample(mean, logvar, jax.random.PRNGKey(1))
        y = vae_decode(params, TINY_VAE, z)
        assert y.shape == (2, 16, 16, 3)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_sample_uses_logvar(self):
        mean = jnp.zeros((1, 2, 2, 1))
        big = vae_sample(mean, jnp.full_like(mean, 4.0), jax.random.PRNGKey(0))
        small = vae_sample(mean, jnp.full_like(mean, -8.0), jax.random.PRNGKey(0))
        assert float(jnp.abs(big).mean()) > float(jnp.abs(small).mean())


class TestUNet:
    def test_forward_shapes_and_jit(self):
        params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
        x = jnp.zeros((2, 8, 8, 4))
        ctx = jnp.zeros((2, 6, 24))
        t = jnp.asarray([10, 500])

        @jax.jit
        def f(p, x, t, c):
            return unet_forward(p, TINY_UNET, x, t, c)

        y = f(params, x, t, ctx)
        assert y.shape == (2, 8, 8, 4)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_context_changes_output(self):
        params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
        x = jnp.ones((1, 8, 8, 4))
        t = jnp.asarray([100])
        y1 = unet_forward(params, TINY_UNET, x, t, jnp.zeros((1, 6, 24)))
        y2 = unet_forward(params, TINY_UNET, x, t, jnp.ones((1, 6, 24)))
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_timestep_changes_output(self):
        params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
        x = jnp.ones((1, 8, 8, 4))
        ctx = jnp.zeros((1, 6, 24))
        y1 = unet_forward(params, TINY_UNET, x, jnp.asarray([1]), ctx)
        y2 = unet_forward(params, TINY_UNET, x, jnp.asarray([999]), ctx)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_sdxl_added_cond(self):
        cfg = sdxl_unet_config(
            sample_size=8,
            block_out_channels=(16, 32),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            transformer_layers_per_block=(1, 1),
            num_attention_heads=(2, 4),
            cross_attention_dim=24,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=8 * 6 + 16,
            norm_num_groups=4,
            layers_per_block=1,
        )
        params = init_unet_params(jax.random.PRNGKey(0), cfg)
        y = unet_forward(
            params, cfg, jnp.zeros((1, 8, 8, 4)), jnp.asarray([5]),
            jnp.zeros((1, 6, 24)),
            added_cond={"time_ids": jnp.ones((1, 6)), "text_embeds": jnp.zeros((1, 16))},
        )
        assert y.shape == (1, 8, 8, 4)


HEAD_CFG = SDHeadConfig(
    unet=TINY_UNET,
    vae=TINY_VAE,
    llm_hidden_size=32,
    projector=ProjectorConfig(projector_type="linear", in_dim=32, out_dim=24),
    uncond_prob=0.5,
    snr_gamma=5.0,
)


class TestHead:
    @pytest.fixture(scope="class")
    def head(self):
        return init_sd_head_params(jax.random.PRNGKey(0), HEAD_CFG)

    def test_loss_masks_invalid_spans(self, head):
        imgs = jnp.zeros((2, 2, 16, 16, 3))
        cond = jnp.zeros((2, 2, 4, 32))
        uncond = jnp.zeros((1, 4, 32))
        valid = jnp.asarray([[True, False], [False, False]])
        loss, aux = sd_head_loss(head, HEAD_CFG, imgs, cond, uncond, valid, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)) and float(loss) > 0
        # all-invalid -> loss 0 (guarded denominator)
        loss0, _ = sd_head_loss(
            head, HEAD_CFG, imgs, cond, uncond, jnp.zeros((2, 2), bool), jax.random.PRNGKey(1)
        )
        assert float(loss0) == 0.0

    def test_loss_grads_flow_to_unet_and_projector(self, head):
        imgs = jnp.zeros((1, 1, 16, 16, 3))
        cond = jnp.ones((1, 1, 4, 32))
        uncond = jnp.zeros((1, 4, 32))
        valid = jnp.ones((1, 1), bool)

        def f(p):
            return sd_head_loss(p, HEAD_CFG, imgs, cond, uncond, valid, jax.random.PRNGKey(2))[0]

        g = jax.grad(f)(head)
        gp = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(g["projector"])))
        gu = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(g["unet"])))
        gv = float(sum(jnp.sum(x**2) for x in jax.tree.leaves(g["vae"])))
        assert gp > 0 and gu > 0
        assert gv == 0.0  # VAE frozen via stop_gradient

    @pytest.mark.parametrize("sampler", ["ddim", "dpm"])
    def test_pipeline_end_to_end(self, head, sampler):
        cond = jnp.ones((1, 4, 32))
        uncond = jnp.zeros((1, 4, 32))
        imgs = sd_head_pipeline(
            head, HEAD_CFG, cond, uncond, jax.random.PRNGKey(3),
            height=16, width=16, num_inference_steps=4, guidance_scale=2.0,
            sampler=sampler,
        )
        assert imgs.shape == (1, 16, 16, 3)
        a = np.asarray(imgs)
        assert np.all(a >= 0) and np.all(a <= 1) and np.all(np.isfinite(a))


class TestDeepCache:
    @pytest.fixture(scope="class")
    def head(self):
        return init_sd_head_params(jax.random.PRNGKey(0), HEAD_CFG)

    def test_interval1_matches_baseline(self, head):
        cond = jnp.ones((1, 4, 32))
        uncond = jnp.zeros((1, 4, 32))
        a = sd_head_pipeline(head, HEAD_CFG, cond, uncond, jax.random.PRNGKey(3),
                             height=16, width=16, num_inference_steps=4,
                             guidance_scale=2.0, deepcache_interval=1)
        b = sd_head_pipeline(head, HEAD_CFG, cond, uncond, jax.random.PRNGKey(3),
                             height=16, width=16, num_inference_steps=4,
                             guidance_scale=2.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_interval2_close_to_full(self, head):
        cond = jnp.ones((1, 4, 32))
        uncond = jnp.zeros((1, 4, 32))
        full = sd_head_pipeline(head, HEAD_CFG, cond, uncond, jax.random.PRNGKey(3),
                                height=16, width=16, num_inference_steps=6,
                                guidance_scale=2.0)
        cached = sd_head_pipeline(head, HEAD_CFG, cond, uncond, jax.random.PRNGKey(3),
                                  height=16, width=16, num_inference_steps=6,
                                  guidance_scale=2.0, deepcache_interval=2)
        a, c = np.asarray(full), np.asarray(cached)
        assert np.all(np.isfinite(c))
        # caching approximates: outputs correlated but not identical
        assert np.abs(a - c).mean() < 0.25
        assert not np.allclose(a, c)

    def test_shallow_forward_shapes(self, head):
        from dreamllm_tpu.models.sd.unet import unet_forward, unet_forward_shallow

        x = jnp.zeros((2, 8, 8, 4))
        ctx = jnp.zeros((2, 6, 24))
        t = jnp.asarray([5, 5])
        out, deep = unet_forward(head["unet"], HEAD_CFG.unet, x, t, ctx, return_deep=True)
        assert deep.shape == (2, 8, 8, HEAD_CFG.unet.block_out_channels[1])
        o2 = unet_forward_shallow(head["unet"], HEAD_CFG.unet, x, t, ctx, deep)
        assert o2.shape == out.shape
        # with the TRUE deep feature, shallow must reproduce the full output
        np.testing.assert_allclose(np.asarray(o2), np.asarray(out), rtol=2e-4, atol=2e-5)
