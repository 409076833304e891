"""DDIM sampler as a single `lax.scan` — no host round-trips.

The reference runs a 200-iteration Python loop, each step launching two
sequential UNet calls for classifier-free guidance (reference
``latent_diffusion/models/ddim.py:165-262,293-299``). Here the whole
trajectory is one compiled program: steps are a `lax.scan` over precomputed
(t, alpha, alpha_prev, sigma) rows, and CFG is a single batched model call
with uncond/cond stacked on the batch axis (as the reference's PLMS already
does, plms.py:288-292).

Supports eta (default 1.0 at generation time, reference ddpm.py:1481),
fixed x_T injection (for parity tests) and mask-blend inpainting
(img = q_sample(x0, t) * mask + (1 - mask) * img, reference ddim.py:226-231).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from audioldm2_tpu.diffusion.schedule import DiffusionSchedule, make_ddim_params

# eps_fn(x [B,...], t [B] int32) -> eps [B,...]; already CFG-combined.
EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def cfg_eps_fn(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    guidance_scale: float,
) -> EpsFn:
    """Wrap a model over a [2B] uncond||cond stacked batch into a guided
    eps function over [B].

    ``model_fn`` receives x tiled to [2B] (first half uncond contexts,
    second half cond contexts — the caller bakes the contexts in) and
    returns [2B] eps. Guidance: e = e_u + s * (e_c - e_u)
    (reference ddim.py:293-300).
    """

    def eps(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        e = model_fn(x2, t2)
        e_u, e_c = jnp.split(e, 2, axis=0)
        return e_u + guidance_scale * (e_c - e_u)

    return eps


def ddim_sample(
    eps_fn: EpsFn,
    key: jax.Array,
    shape,
    schedule: DiffusionSchedule,
    num_steps: int = 200,
    eta: float = 1.0,
    x_T: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    dtype=jnp.float32,
    unroll: int = 2,
) -> jnp.ndarray:
    """Run the full DDIM trajectory; returns x_0-latents [B, ...].

    shape: static latent shape (B, T, F, C). mask: [B, T, F, 1] with 1 =
    keep original (q-sampled x0) — inpainting semantics of the reference.
    """
    ts, alphas, alphas_prev, sigmas = make_ddim_params(schedule, num_steps, eta)
    # reverse order: iterate t descending (reference np.flip(timesteps))
    ts_r = jnp.asarray(ts[::-1].copy())
    al_r = jnp.asarray(alphas[::-1].copy())
    ap_r = jnp.asarray(alphas_prev[::-1].copy())
    sg_r = jnp.asarray(sigmas[::-1].copy())

    key, k_init = jax.random.split(key)
    img = x_T if x_T is not None else jax.random.normal(k_init, shape, dtype)
    step_keys = jax.random.split(key, len(ts))

    sqrt_acum = jnp.asarray(schedule.sqrt_alphas_cumprod)
    sqrt_1macum = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)

    b = shape[0]

    def body(img, per_step):
        t, a_t, a_prev, sigma, k = per_step
        k_q, k_n = jax.random.split(k)

        if mask is not None:
            img_orig = sqrt_acum[t] * x0 + sqrt_1macum[t] * jax.random.normal(
                k_q, x0.shape, dtype
            )
            img = img_orig * mask + (1.0 - mask) * img

        tb = jnp.full((b,), t, jnp.int32)
        e_t = eps_fn(img, tb)

        sqrt_one_minus_at = jnp.sqrt(1.0 - a_t)
        pred_x0 = (img - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * e_t
        noise = sigma * jax.random.normal(k_n, img.shape, dtype) * temperature
        img = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
        return img, None

    # unroll=2 halves while-loop bookkeeping (~0.3 ms/step measured) without
    # meaningfully growing the program
    img, _ = jax.lax.scan(
        body, img, (ts_r, al_r, ap_r, sg_r, step_keys), unroll=unroll
    )
    return img


def q_sample(
    schedule_sqrt_acum, schedule_sqrt_1macum, x0, t, noise
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) (reference ddpm.py:430-436)."""
    return schedule_sqrt_acum[t] * x0 + schedule_sqrt_1macum[t] * noise
