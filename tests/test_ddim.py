"""DDIM sampler parity and behavior tests.

Trajectory parity vs the reference DDIMSampler is tested with a fixed x_T,
eta=0 (deterministic path) and an analytic eps model, so torch/jax RNG
differences never enter (the strategy SURVEY.md §4 prescribes: inject noise
at the sampler boundary).
"""

import numpy as np
import pytest

import _reference
from audioldm2_tpu.diffusion import schedule as sched
from audioldm2_tpu.diffusion.ddim import cfg_eps_fn, ddim_sample

SCHED = sched.DiffusionSchedule.create(1000, "linear", 0.0015, 0.0195)
SHAPE = (2, 8, 4, 3)
GUIDANCE = 3.5


def _analytic_eps(x, t, cond_scale):
    """Deterministic eps: scale * x + sin(t)/3 broadcast (jnp — runs traced)."""
    import jax.numpy as jnp

    return cond_scale * x + jnp.sin(t.astype(jnp.float32))[:, None, None, None] / 3.0


class _FakeTorchModel:
    """Minimal duck-typed model for the reference DDIMSampler."""

    parameterization = "eps"

    def __init__(self, torch):
        self.torch = torch
        self.device = torch.device("cpu")
        self.num_timesteps = SCHED.num_timesteps
        self.betas = torch.from_numpy(SCHED.betas)
        self.alphas_cumprod = torch.from_numpy(SCHED.alphas_cumprod)
        self.alphas_cumprod_prev = torch.from_numpy(SCHED.alphas_cumprod_prev)
        self.sqrt_one_minus_alphas_cumprod = torch.from_numpy(
            SCHED.sqrt_one_minus_alphas_cumprod
        )

    def apply_model(self, x, t, cond):
        scale = 0.10 if cond["kind"] == "cond" else 0.05
        return scale * x + self.torch.sin(t.float())[:, None, None, None] / 3.0


def test_schedule_matches_reference():
    torch = pytest.importorskip("torch")
    util = _reference.load(
        "audioldm2.latent_diffusion.modules.diffusionmodules.util"
    )
    betas_ref = util.make_beta_schedule("linear", 1000, 0.0015, 0.0195)
    np.testing.assert_allclose(SCHED.betas, betas_ref, rtol=1e-6)
    ts_ref = util.make_ddim_timesteps("uniform", 200, 1000, verbose=False)
    ts, alphas, alphas_prev, sigmas = sched.make_ddim_params(SCHED, 200, eta=1.0)
    np.testing.assert_array_equal(ts, ts_ref)
    sig_ref, al_ref, alp_ref = util.make_ddim_sampling_parameters(
        alphacums=torch.from_numpy(SCHED.alphas_cumprod), ddim_timesteps=ts_ref,
        eta=1.0, verbose=False,
    )
    np.testing.assert_allclose(alphas, al_ref, rtol=1e-5)
    np.testing.assert_allclose(alphas_prev, alp_ref, rtol=1e-5)
    np.testing.assert_allclose(sigmas, sig_ref.numpy(), rtol=1e-4, atol=1e-7)


def test_ddim_trajectory_parity_eta0(rng):
    torch = pytest.importorskip("torch")
    ddim_mod = _reference.load("audioldm2.latent_diffusion.models.ddim")
    model = _FakeTorchModel(torch)
    sampler = ddim_mod.DDIMSampler(model, device=torch.device("cpu"))

    x_T = rng.standard_normal(SHAPE).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = sampler.sample(
            S=20,
            batch_size=SHAPE[0],
            shape=SHAPE[1:],
            conditioning={"kind": "cond"},
            eta=0.0,
            x_T=torch.from_numpy(x_T),
            verbose=False,
            unconditional_guidance_scale=GUIDANCE,
            unconditional_conditioning={"kind": "uncond"},
        )

    def model_fn(x2, t2):
        import jax.numpy as jnp

        b = SHAPE[0]
        e_u = _analytic_eps(x2[:b], t2[:b], 0.05)
        e_c = _analytic_eps(x2[b:], t2[b:], 0.10)
        return jnp.concatenate([e_u, e_c], axis=0)

    import jax

    out = ddim_sample(
        cfg_eps_fn(model_fn, GUIDANCE),
        jax.random.PRNGKey(0),
        SHAPE,
        SCHED,
        num_steps=20,
        eta=0.0,
        x_T=x_T,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=3e-4, rtol=1e-3)


def test_ddim_mask_inpainting_keeps_region():
    import jax

    x0 = np.full(SHAPE, 0.7, np.float32)
    mask = np.zeros((SHAPE[0], SHAPE[1], SHAPE[2], 1), np.float32)
    mask[:, :4] = 1.0  # keep first half of time rows

    def eps_fn(x, t):
        return 0.0 * x

    out = np.asarray(
        ddim_sample(
            eps_fn,
            jax.random.PRNGKey(1),
            SHAPE,
            SCHED,
            num_steps=10,
            eta=0.0,
            mask=jax.numpy.asarray(mask),
            x0=jax.numpy.asarray(x0),
        )
    )
    # At the final step t=1, alphas_cumprod[1] ~ 0.997: the masked region is
    # pinned near x0 while the free region evolved from pure noise.
    kept = out[:, :4]
    free = out[:, 4:]
    assert np.abs(kept - x0[:, :4]).mean() < 0.15
    assert np.abs(free - x0[:, 4:]).mean() > 0.3


def test_ddim_deterministic_given_key():
    import jax

    def eps_fn(x, t):
        return 0.1 * x

    a = ddim_sample(eps_fn, jax.random.PRNGKey(7), SHAPE, SCHED, num_steps=5, eta=1.0)
    b = ddim_sample(eps_fn, jax.random.PRNGKey(7), SHAPE, SCHED, num_steps=5, eta=1.0)
    c = ddim_sample(eps_fn, jax.random.PRNGKey(8), SHAPE, SCHED, num_steps=5, eta=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_non_divisor_ddim_steps_raises_clearly():
    """ddim_steps that don't divide the schedule raise a ValueError (the
    reference IndexErrors on the same inputs, util.py:55-75)."""
    import pytest

    from audioldm2_tpu.diffusion.schedule import make_ddim_timesteps

    with pytest.raises(ValueError, match="evenly divide"):
        make_ddim_timesteps(3, 1000)
    assert make_ddim_timesteps(4, 1000).tolist() == [1, 251, 501, 751]


def test_stochastic_encode_parity(rng):
    """stochastic_encode vs reference ddim.py:433-449 with shared noise —
    both DDIM-subset and raw-DDPM-timestep indexing."""
    torch = pytest.importorskip("torch")
    import jax

    from audioldm2_tpu.diffusion.ddim import stochastic_encode

    ddim_mod = _reference.load("audioldm2.latent_diffusion.models.ddim")
    sampler = ddim_mod.DDIMSampler(_FakeTorchModel(torch), device=torch.device("cpu"))
    sampler.make_schedule(ddim_num_steps=20, ddim_eta=0.0, verbose=False)

    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    noise = rng.standard_normal(SHAPE).astype(np.float32)
    for t_index, use_orig in [(7, False), (19, False), (431, True)]:
        with torch.no_grad():
            ref = sampler.stochastic_encode(
                torch.from_numpy(x0),
                torch.full((SHAPE[0],), t_index, dtype=torch.long),
                use_original_steps=use_orig,
                noise=torch.from_numpy(noise),
            )
        out = stochastic_encode(
            None, jax.numpy.asarray(x0), t_index, SCHED, num_steps=20,
            noise=jax.numpy.asarray(noise), use_original_steps=use_orig,
        )
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_ddim_decode_trajectory_parity(rng):
    """ddim_decode (the audio-to-audio editing path) vs the reference
    decode loop over np.flip(timesteps[:t_start]) (ddim.py:451-491), CFG on."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from audioldm2_tpu.diffusion.ddim import ddim_decode, stochastic_encode

    ddim_mod = _reference.load("audioldm2.latent_diffusion.models.ddim")
    sampler = ddim_mod.DDIMSampler(_FakeTorchModel(torch), device=torch.device("cpu"))
    sampler.make_schedule(ddim_num_steps=20, ddim_eta=0.0, verbose=False)

    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    noise = rng.standard_normal(SHAPE).astype(np.float32)
    t_start = 13
    x_enc = stochastic_encode(
        None, jnp.asarray(x0), t_start - 1, SCHED, num_steps=20,
        noise=jnp.asarray(noise),
    )
    with torch.no_grad():
        ref = sampler.decode(
            torch.from_numpy(np.asarray(x_enc)),
            {"kind": "cond"},
            t_start,
            unconditional_guidance_scale=GUIDANCE,
            unconditional_conditioning={"kind": "uncond"},
        )

    def model_fn(x2, t2):
        b = SHAPE[0]
        e_u = _analytic_eps(x2[:b], t2[:b], 0.05)
        e_c = _analytic_eps(x2[b:], t2[b:], 0.10)
        import jax.numpy as jnp

        return jnp.concatenate([e_u, e_c], axis=0)

    out = ddim_decode(
        cfg_eps_fn(model_fn, GUIDANCE), x_enc, SCHED, t_start, num_steps=20
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-4, rtol=1e-3)
