"""Ancestral DDPM sampler parity and behavior tests.

Trajectory parity runs the reference's own p_sample_loop/p_sample/
p_mean_variance methods (ddpm.py:1081-1340) duck-typed over a fake self, on
a short 50-step schedule, with noise_like monkeypatched to zeros so
torch/jax RNG differences never enter; the JAX sampler runs with
temperature=0 (same noiseless trajectory).
"""

import numpy as np
import pytest

import _reference
from audioldm2_tpu.diffusion import schedule as sched
from audioldm2_tpu.diffusion.ddpm_ancestral import ddpm_sample

SCHED = sched.DiffusionSchedule.create(50, "linear", 0.0015, 0.0195)
SHAPE = (2, 8, 4, 3)


def test_posterior_quantities_match_reference_formulas():
    """Schedule extras vs the reference register_schedule math
    (ddpm.py:201-303, v_posterior=0), recomputed in float64."""
    betas = sched.make_beta_schedule("linear", 50, 0.0015, 0.0195)
    alphas = 1.0 - betas
    acum = np.cumprod(alphas)
    acum_prev = np.append(1.0, acum[:-1])
    np.testing.assert_allclose(
        SCHED.sqrt_recip_alphas_cumprod, np.sqrt(1.0 / acum), rtol=1e-6
    )
    np.testing.assert_allclose(
        SCHED.sqrt_recipm1_alphas_cumprod, np.sqrt(1.0 / acum - 1.0), rtol=1e-6
    )
    post_var = betas * (1.0 - acum_prev) / (1.0 - acum)
    np.testing.assert_allclose(
        SCHED.posterior_log_variance_clipped,
        np.log(np.maximum(post_var, 1e-20)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        SCHED.posterior_mean_coef1, betas * np.sqrt(acum_prev) / (1.0 - acum), rtol=1e-6
    )
    np.testing.assert_allclose(
        SCHED.posterior_mean_coef2,
        (1.0 - acum_prev) * np.sqrt(alphas) / (1.0 - acum),
        rtol=1e-6,
    )


def test_ancestral_trajectory_parity_noiseless(rng, monkeypatch):
    torch = pytest.importorskip("torch")
    ddpm_mod = _reference.load("audioldm2.latent_diffusion.models.ddpm")

    monkeypatch.setattr(
        ddpm_mod, "noise_like", lambda shape, device, repeat=False: torch.zeros(shape)
    )

    class _FakeLDM:
        # reference methods run unbound over this fake self
        p_sample_loop = ddpm_mod.LatentDiffusion.p_sample_loop
        p_sample = ddpm_mod.LatentDiffusion.p_sample
        p_mean_variance = ddpm_mod.LatentDiffusion.p_mean_variance
        predict_start_from_noise = ddpm_mod.DDPM.predict_start_from_noise
        q_posterior = ddpm_mod.DDPM.q_posterior

        parameterization = "eps"
        clip_denoised = False
        shorten_cond_schedule = False
        log_every_t = 1000

        def __init__(self):
            self.num_timesteps = SCHED.num_timesteps
            self.betas = torch.from_numpy(SCHED.betas)
            for name in (
                "sqrt_recip_alphas_cumprod",
                "sqrt_recipm1_alphas_cumprod",
                "posterior_mean_coef1",
                "posterior_mean_coef2",
            ):
                setattr(self, name, torch.from_numpy(getattr(SCHED, name)))
            self.posterior_variance = torch.from_numpy(
                np.exp(SCHED.posterior_log_variance_clipped)
            )
            self.posterior_log_variance_clipped = torch.from_numpy(
                SCHED.posterior_log_variance_clipped
            )

        def apply_model(self, x, t, c, return_ids=False):
            return 0.1 * x + torch.sin(t.float())[:, None, None, None] / 3.0

    x_T = rng.standard_normal(SHAPE).astype(np.float32)
    fake = _FakeLDM()
    with torch.no_grad():
        ref_out = fake.p_sample_loop(
            cond=None, shape=SHAPE, x_T=torch.from_numpy(x_T), verbose=False
        )

    def eps_fn(x, t):
        import jax.numpy as jnp

        return 0.1 * x + jnp.sin(t.astype(jnp.float32))[:, None, None, None] / 3.0

    import jax

    out = ddpm_sample(
        eps_fn, jax.random.PRNGKey(0), SHAPE, SCHED, x_T=x_T, temperature=0.0
    )
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=3e-4, rtol=1e-3)


def test_ancestral_mask_keeps_region():
    import jax

    x0 = np.full(SHAPE, 0.7, np.float32)
    mask = np.zeros((SHAPE[0], SHAPE[1], SHAPE[2], 1), np.float32)
    mask[:, :4] = 1.0

    def eps_fn(x, t):
        return 0.0 * x

    out = np.asarray(
        ddpm_sample(
            eps_fn, jax.random.PRNGKey(1), SHAPE, SCHED,
            mask=jax.numpy.asarray(mask), x0=jax.numpy.asarray(x0),
        )
    )
    kept = out[:, :4]
    free = out[:, 4:]
    # final blend at t=0: kept region = q_sample(x0, 0) ~ x0
    assert np.abs(kept - x0[:, :4]).mean() < 0.15
    assert np.abs(free - x0[:, 4:]).mean() > 0.3


def test_ancestral_deterministic_given_key():
    import jax

    def eps_fn(x, t):
        return 0.1 * x

    a = ddpm_sample(eps_fn, jax.random.PRNGKey(7), SHAPE, SCHED)
    b = ddpm_sample(eps_fn, jax.random.PRNGKey(7), SHAPE, SCHED)
    c = ddpm_sample(eps_fn, jax.random.PRNGKey(8), SHAPE, SCHED)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3
