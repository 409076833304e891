"""Ancestral DDPM sampler as a single `lax.scan` — no host round-trips.

The reference falls back to the full 1000-step ancestral p_sample loop when
DDIM and PLMS are both off (reference ``ddpm.py:1417-1474`` sample_log ->
``:1350`` sample -> ``:1277`` p_sample_loop -> ``:1127`` p_sample): each
step predicts x_0 from eps, forms the posterior q(x_{t-1} | x_t, x_0) mean
and adds exp(0.5 * log_var) noise (none at t == 0). The inpainting mask is
blended *after* the step (``:1334-1336`` — unlike DDIM, which blends before
the model call).

Note: the reference's ancestral path silently drops
``unconditional_guidance_scale`` (swallowed in ``sample``'s **kwargs,
ddpm.py:1350-1392) — conditioning is applied but CFG is not. Here the
sampler takes the same already-CFG-combined ``eps_fn`` as DDIM/PLMS, so
guidance works uniformly across samplers; pass guidance 1.0 for the
reference's exact behavior.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from audioldm2_tpu.diffusion.ddim import EpsFn
from audioldm2_tpu.diffusion.schedule import DiffusionSchedule


def ddpm_sample(
    eps_fn: EpsFn,
    key: jax.Array,
    shape,
    schedule: DiffusionSchedule,
    x_T: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    clip_denoised: bool = False,
    temperature: float = 1.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Run the full ancestral trajectory (schedule.num_timesteps steps,
    t descending). shape: static (B, T, F, C). mask: 1 = keep original
    (q-sampled x0), matching the reference's inpainting semantics."""
    T = schedule.num_timesteps
    ts_r = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

    sqrt_recip = jnp.asarray(schedule.sqrt_recip_alphas_cumprod)
    sqrt_recipm1 = jnp.asarray(schedule.sqrt_recipm1_alphas_cumprod)
    coef1 = jnp.asarray(schedule.posterior_mean_coef1)
    coef2 = jnp.asarray(schedule.posterior_mean_coef2)
    log_var = jnp.asarray(schedule.posterior_log_variance_clipped)
    sqrt_acum = jnp.asarray(schedule.sqrt_alphas_cumprod)
    sqrt_1macum = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)

    key, k_init = jax.random.split(key)
    img = x_T if x_T is not None else jax.random.normal(k_init, shape, dtype)
    step_keys = jax.random.split(key, T)

    b = shape[0]

    def body(img, per_step):
        t, k = per_step
        k_n, k_q = jax.random.split(k)

        tb = jnp.full((b,), t, jnp.int32)
        e_t = eps_fn(img, tb)

        # predict_start_from_noise (reference ddpm.py:357-362)
        x_recon = sqrt_recip[t] * img - sqrt_recipm1[t] * e_t
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = coef1[t] * x_recon + coef2[t] * img

        noise = jax.random.normal(k_n, img.shape, dtype) * temperature
        nonzero = (t > 0).astype(dtype)
        img = mean + nonzero * jnp.exp(0.5 * log_var[t]) * noise

        if mask is not None:
            img_orig = sqrt_acum[t] * x0 + sqrt_1macum[t] * jax.random.normal(
                k_q, x0.shape, dtype
            )
            img = img_orig * mask + (1.0 - mask) * img
        return img, None

    img, _ = jax.lax.scan(body, img, (ts_r, step_keys))
    return img
