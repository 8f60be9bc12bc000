"""Scheduler golden/invariant tests (VERDICT r2 Next #4).

No diffusers (and no network) exists in this environment, so "published
reference trajectories" are replaced by two stronger local forms of
evidence, per scheduler step function:

1. **Independent re-derivation in a different parameterization.** The
   implementations in models/sd/schedulers.py are x0-parameterized; here
   each step is re-implemented in numpy directly from the papers' eps-form
   closed expressions (DDPM: Ho et al. 2020 Eq. 11 + beta-tilde variance;
   DDIM: Song et al. 2021 Eq. 12). Identical outputs from different algebra
   is real cross-implementation evidence, the same standard
   tests/_torch_sd_reference.py sets for the UNet/VAE.

2. **Exact-oracle recovery.** With a model that returns the exact eps (or
   v) for a known x0*, any correct sampler's trajectory contracts to x0*:
   DDIM and DPM-Solver++(2M) must recover x0* to float tolerance (the
   DPM-Solver 2M update IS the closed-form ODE solution when x0-hat is
   constant), and 1000-step ancestral DDPM lands within its residual noise.

Reference protocol anchor: the reference drives diffusers schedulers at
modeling_plugins.py:381,511-543 (train) and :806-839 (denoise loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.models.sd.schedulers import (
    DiffusionSchedule,
    add_noise,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    dpm_solver_step,
    dpm_solver_timesteps,
    get_velocity,
    make_schedule,
    pred_x0_eps,
    snr,
)

SCHED = make_schedule()  # SD defaults: scaled_linear 0.00085..0.012, T=1000
ACP = np.asarray(SCHED.alphas_cumprod, np.float64)
BETAS = np.asarray(SCHED.betas, np.float64)


# ---------------------------------------------------------------------------
# schedule table goldens
# ---------------------------------------------------------------------------


def test_schedule_table_golden():
    """Known SD scaled-linear endpoints (b0=0.00085, b1=0.012, T=1000)."""
    assert BETAS[0] == pytest.approx(0.00085, rel=1e-6)
    assert BETAS[-1] == pytest.approx(0.012, rel=1e-6)
    # interior point: beta_t = (sqrt(b0) + t/(T-1)*(sqrt(b1)-sqrt(b0)))^2
    t = 500
    want = (0.00085**0.5 + t / 999 * (0.012**0.5 - 0.00085**0.5)) ** 2
    assert BETAS[t] == pytest.approx(want, rel=1e-5)
    assert ACP[0] == pytest.approx(1.0 - 0.00085, rel=1e-6)
    # SD's well-known terminal alphas_cumprod (non-zero-SNR tail)
    assert ACP[-1] == pytest.approx(np.prod(1.0 - BETAS), rel=1e-6)
    assert 0.0046 < ACP[-1] < 0.0048


def test_ddim_timestep_spacing_golden():
    """"leading" spacing with steps_offset=1 — the SD convention."""
    ts = np.asarray(ddim_timesteps(1000, 50))
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50 and np.all(np.diff(ts) == -20)
    ts25 = np.asarray(dpm_solver_timesteps(1000, 25))
    assert ts25[0] == 961 and ts25[-1] == 1 and np.all(np.diff(ts25) == -40)


# ---------------------------------------------------------------------------
# algebraic identities
# ---------------------------------------------------------------------------


def test_pred_x0_eps_roundtrips_both_param_types():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    t = jnp.asarray([3, 700], jnp.int32)
    x_t = add_noise(SCHED, x0, noise, t)

    # epsilon param: feeding the true eps must recover (x0, eps)
    x0h, epsh = pred_x0_eps(SCHED, noise, x_t, t)
    np.testing.assert_allclose(np.asarray(x0h), np.asarray(x0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(epsh), np.asarray(noise), atol=1e-5)

    # v param: feeding the true v must recover the same (x0, eps)
    vsched = DiffusionSchedule(
        betas=SCHED.betas, alphas_cumprod=SCHED.alphas_cumprod,
        num_train_timesteps=1000, prediction_type="v_prediction",
    )
    v = get_velocity(SCHED, x0, noise, t)
    x0v, epsv = pred_x0_eps(vsched, v, x_t, t)
    np.testing.assert_allclose(np.asarray(x0v), np.asarray(x0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(epsv), np.asarray(noise), atol=2e-4)


def test_snr_closed_form():
    t = jnp.asarray([0, 500, 999], jnp.int32)
    got = np.asarray(snr(SCHED, t), np.float64)
    want = ACP[[0, 500, 999]] / (1.0 - ACP[[0, 500, 999]])
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# DDPM vs Ho et al. (2020) eps-form (Eq. 11) — independent algebra
# ---------------------------------------------------------------------------


def _ddpm_step_eps_form(eps, t, x_t, z):
    """x_{t-1} = 1/sqrt(a_t) * (x_t - b_t/sqrt(1-acp_t) * eps) + sqrt(bt~) z,
    beta-tilde = (1-acp_{t-1})/(1-acp_t) * b_t  (fixed_small variance)."""
    a_t = 1.0 - BETAS[t]
    acp_t = ACP[t]
    acp_prev = ACP[t - 1] if t > 0 else 1.0
    mean = (x_t - BETAS[t] / np.sqrt(1.0 - acp_t) * eps) / np.sqrt(a_t)
    if t == 0:
        return mean
    var = (1.0 - acp_prev) / (1.0 - acp_t) * BETAS[t]
    return mean + np.sqrt(var) * z


@pytest.mark.parametrize("t", [0, 1, 400, 999])
def test_ddpm_step_matches_eps_form(t):
    rng = np.random.default_rng(t)
    x_t = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal(x_t.shape).astype(np.float32)
    key = jax.random.PRNGKey(t)
    z = np.asarray(jax.random.normal(key, x_t.shape, jnp.float32), np.float64)

    got = np.asarray(
        ddpm_step(SCHED, jnp.asarray(eps), jnp.asarray([t], jnp.int32),
                  jnp.asarray(x_t), key),
        np.float64,
    )
    want = _ddpm_step_eps_form(eps.astype(np.float64), t,
                               x_t.astype(np.float64), z)
    # t=0: the 1/sqrt(1-acp_0) ≈ 34 factor amplifies fp32 rounding vs the
    # float64 reference — pure precision, not algebra
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# DDIM vs Song et al. (2021) Eq. 12 — independent algebra, incl. eta > 0
# ---------------------------------------------------------------------------


def _ddim_step_eq12(eps, t, t_prev, x_t, eta, z):
    acp_t = ACP[t]
    acp_prev = ACP[t_prev] if t_prev >= 0 else ACP[0]  # SD set_alpha_to_one=False
    x0 = (x_t - np.sqrt(1.0 - acp_t) * eps) / np.sqrt(acp_t)
    sigma = eta * np.sqrt((1 - acp_prev) / (1 - acp_t)) * np.sqrt(1 - acp_t / acp_prev)
    out = (
        np.sqrt(acp_prev) * x0
        + np.sqrt(1.0 - acp_prev - sigma**2) * eps
    )
    return out + sigma * z if eta > 0 else out


@pytest.mark.parametrize("t,t_prev,eta", [(981, 961, 0.0), (41, 21, 0.0),
                                          (21, 1, 0.0), (1, -19, 0.0),
                                          (501, 481, 1.0)])
def test_ddim_step_matches_eq12(t, t_prev, eta):
    rng = np.random.default_rng(t)
    x_t = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal(x_t.shape).astype(np.float32)
    key = jax.random.PRNGKey(t)
    z = np.asarray(jax.random.normal(key, x_t.shape, jnp.float32), np.float64)
    got = np.asarray(
        ddim_step(SCHED, jnp.asarray(eps), jnp.asarray([t], jnp.int32),
                  jnp.asarray([t_prev], jnp.int32), jnp.asarray(x_t),
                  eta=eta, rng=key),
        np.float64,
    )
    want = _ddim_step_eq12(eps.astype(np.float64), t, t_prev,
                           x_t.astype(np.float64), eta, z)
    np.testing.assert_allclose(got, want, atol=5e-5)


# ---------------------------------------------------------------------------
# exact-oracle trajectory recovery
# ---------------------------------------------------------------------------


def _oracle_eps(x0_star):
    def model(x_t, t):
        acp_t = _b(ACP[int(t)])
        return (x_t - np.sqrt(acp_t) * x0_star) / np.sqrt(1.0 - acp_t)

    return model


def _b(v):
    return np.float32(v)


def test_ddim_oracle_recovers_x0():
    """With exact eps, the 50-step DDIM trajectory ends at
    sqrt(acp[0])*x0 + sqrt(1-acp[0])*eps — the documented
    set_alpha_to_one=False terminal (not exactly x0)."""
    rng = np.random.default_rng(1)
    x0_star = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    model = _oracle_eps(x0_star)
    ts = np.asarray(ddim_timesteps(1000, 50))
    x = rng.standard_normal(x0_star.shape).astype(np.float32)
    for i, t in enumerate(ts):
        t_prev = int(ts[i + 1]) if i + 1 < len(ts) else int(t) - 20
        eps = model(x, t)
        x = np.asarray(ddim_step(
            SCHED, jnp.asarray(eps), jnp.asarray([int(t)], jnp.int32),
            jnp.asarray([t_prev], jnp.int32), jnp.asarray(x),
        ))
    # final eps equals the last model call's eps at the terminal alpha
    acp0 = ACP[0]
    eps_fin = (x - np.sqrt(acp0) * x0_star) / np.sqrt(1 - acp0)
    np.testing.assert_allclose(
        x, np.sqrt(acp0) * x0_star + np.sqrt(1 - acp0) * eps_fin, atol=1e-4
    )
    np.testing.assert_allclose(x, x0_star, atol=0.15)  # ~sqrt(1-acp0) residual


def test_dpm_solver_oracle_recovers_x0_exactly():
    """When x0-hat is constant, the 2M update is the exact ODE solution —
    the 20-step trajectory must land on (nearly exactly) x0*."""
    rng = np.random.default_rng(2)
    x0_star = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    model = _oracle_eps(x0_star)
    ts = np.asarray(dpm_solver_timesteps(1000, 20))
    x = rng.standard_normal(x0_star.shape).astype(np.float32)
    last_x0, t_last = None, None
    for i, t in enumerate(ts):
        t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
        eps = model(x, t)
        x, x0h = dpm_solver_step(
            SCHED, jnp.asarray(eps), jnp.asarray([int(t)], jnp.int32),
            jnp.asarray([t_prev], jnp.int32), jnp.asarray(x),
            last_x0, t_last,
        )
        x = np.asarray(x)
        last_x0, t_last = x0h, jnp.asarray([int(t)], jnp.int32)
        # every intermediate x0 prediction is exact under the oracle
        np.testing.assert_allclose(np.asarray(x0h), x0_star, atol=2e-3)
    np.testing.assert_allclose(x, x0_star, atol=5e-3)


def test_ddpm_oracle_contracts_to_x0():
    """Full-schedule ancestral sampling with exact eps concentrates on x0*
    (residual = accumulated fixed_small noise, small near t=0)."""
    rng = np.random.default_rng(3)
    x0_star = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    x_init = jnp.asarray(rng.standard_normal(x0_star.shape), jnp.float32)

    @jax.jit
    def run(x, key):
        def body(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            acp_t = SCHED.alphas_cumprod[t]
            eps = (x - jnp.sqrt(acp_t) * x0_star) / jnp.sqrt(1.0 - acp_t)
            x = ddpm_step(SCHED, eps, t[None], x, sub)
            return (x, key), None

        (x, _), _ = jax.lax.scan(
            body, (x, key), jnp.arange(999, -1, -1, dtype=jnp.int32)
        )
        return x

    x = np.asarray(run(x_init, jax.random.PRNGKey(0)))
    x0s = np.asarray(x0_star)
    np.testing.assert_allclose(x, x0s, atol=0.12)
    assert np.mean((x - x0s) ** 2) < 2e-3
