"""PLMS sampler parity vs the reference PLMSSampler."""

import numpy as np
import pytest

import _reference
from audioldm2_tpu.diffusion import schedule as sched
from audioldm2_tpu.diffusion.ddim import cfg_eps_fn
from audioldm2_tpu.diffusion.plms import plms_sample

SCHED = sched.DiffusionSchedule.create(1000, "linear", 0.0015, 0.0195)
SHAPE = (2, 8, 4, 3)
GUIDANCE = 3.5


class _FakeTorchModel:
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
        # cond: [B, 1] with 1.0 = cond branch, 0.0 = uncond (the reference
        # PLMS CFG concatenates raw tensors, plms.py:287-290 — its dict path
        # is unusable)
        scale = (0.05 + 0.05 * cond)[:, :, None, None]
        return scale * x + self.torch.sin(t.float())[:, None, None, None] / 3.0


def test_plms_trajectory_parity(rng):
    torch = pytest.importorskip("torch")
    plms_mod = _reference.load("audioldm2.latent_diffusion.models.plms")
    model = _FakeTorchModel(torch)
    sampler = plms_mod.PLMSSampler(model)
    # reference PLMSSampler.register_buffer hardcodes .to("cuda")
    # (plms.py:23-24); keep buffers on CPU for the golden run
    import types

    sampler.register_buffer = types.MethodType(
        lambda self, name, attr: setattr(self, name, attr), sampler
    )

    x_T = rng.standard_normal(SHAPE).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = sampler.sample(
            S=20,
            batch_size=SHAPE[0],
            shape=SHAPE[1:],
            conditioning=torch.ones(SHAPE[0], 1),
            eta=0.0,
            x_T=torch.from_numpy(x_T),
            verbose=False,
            unconditional_guidance_scale=GUIDANCE,
            unconditional_conditioning=torch.zeros(SHAPE[0], 1),
        )

    import jax
    import jax.numpy as jnp

    def model_fn(x2, t2):
        b = SHAPE[0]
        tt = t2.astype(jnp.float32)
        e_u = 0.05 * x2[:b] + jnp.sin(tt[:b])[:, None, None, None] / 3.0
        e_c = 0.10 * x2[b:] + jnp.sin(tt[b:])[:, None, None, None] / 3.0
        return jnp.concatenate([e_u, e_c], axis=0)

    out = plms_sample(
        cfg_eps_fn(model_fn, GUIDANCE),
        jax.random.PRNGKey(0),
        SHAPE,
        SCHED,
        num_steps=20,
        x_T=x_T,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=5e-4, rtol=1e-3)


def test_plms_mask_inpainting_keeps_region():
    """The reference PLMS implements the same q_sample mask blend as DDIM
    (plms.py:103,222-227); the blend noise is drawn inside the loop, so the
    check is behavioral (RNG streams differ): masked rows stay pinned to x0,
    free rows evolve from noise."""
    import jax

    x0 = np.full(SHAPE, 0.7, np.float32)
    mask = np.zeros((SHAPE[0], SHAPE[1], SHAPE[2], 1), np.float32)
    mask[:, :4] = 1.0

    def eps_fn(x, t):
        return 0.0 * x

    out = np.asarray(
        plms_sample(
            eps_fn,
            jax.random.PRNGKey(1),
            SHAPE,
            SCHED,
            num_steps=10,
            mask=jax.numpy.asarray(mask),
            x0=jax.numpy.asarray(x0),
        )
    )
    kept, free = out[:, :4], out[:, 4:]
    assert np.abs(kept - x0[:, :4]).mean() < 0.15
    assert np.abs(free - x0[:, 4:]).mean() > 0.3
