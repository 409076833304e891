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
    t_start: Optional[int] = None,
) -> jnp.ndarray:
    """Run the full DDIM trajectory; returns x_0-latents [B, ...].

    shape: static latent shape (B, T, F, C). mask: [B, T, F, 1] with 1 =
    keep original (q-sampled x0) — inpainting semantics of the reference.
    t_start: run only the first ``t_start`` subset steps (descending from
    subset index t_start-1) — the reference DDIM ``decode`` trajectory
    (ddim.py:451-491); x_T is then the latent at subset step t_start.
    """
    ts, alphas, alphas_prev, sigmas = make_ddim_params(schedule, num_steps, eta)
    if t_start is not None:
        ts = ts[:t_start]
        alphas = alphas[:t_start]
        alphas_prev = alphas_prev[:t_start]
        sigmas = sigmas[:t_start]
    # reverse order: iterate t descending (reference np.flip(timesteps))
    ts_r = jnp.asarray(ts[::-1].copy())
    al_r = jnp.asarray(alphas[::-1].copy())
    ap_r = jnp.asarray(alphas_prev[::-1].copy())
    sg_r = jnp.asarray(sigmas[::-1].copy())

    if key is None:
        # fully deterministic call (eta=0, x_T given, no mask) — e.g.
        # ddim_decode; the step keys below are split but never consumed
        assert x_T is not None and eta == 0.0 and mask is None
        key = jax.random.PRNGKey(0)
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


def stochastic_encode(
    key: Optional[jax.Array],
    x0: jnp.ndarray,
    t_index,
    schedule: DiffusionSchedule,
    num_steps: int = 200,
    noise: Optional[jnp.ndarray] = None,
    use_original_steps: bool = False,
) -> jnp.ndarray:
    """Diffuse a clean latent forward to DDIM-subset step ``t_index``
    (reference ddim.py:433-449): the audio-to-audio / editing entry —
    encode a real latent partway, then :func:`decode` it back under new
    conditioning.

    ``t_index`` indexes the DDIM subset (0..num_steps-1) unless
    ``use_original_steps``, in which case it is a raw DDPM timestep.
    """
    if use_original_steps:
        sqrt_a = jnp.asarray(schedule.sqrt_alphas_cumprod)
        sqrt_1ma = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)
    else:
        _, alphas, _, _ = make_ddim_params(schedule, num_steps, eta=0.0)
        sqrt_a = jnp.sqrt(jnp.asarray(alphas))
        sqrt_1ma = jnp.sqrt(1.0 - jnp.asarray(alphas))
    if noise is None:
        noise = jax.random.normal(key, x0.shape, x0.dtype)
    return sqrt_a[t_index] * x0 + sqrt_1ma[t_index] * noise


def ddim_decode(
    eps_fn: EpsFn,
    x_latent: jnp.ndarray,
    schedule: DiffusionSchedule,
    t_start: int,
    num_steps: int = 200,
    unroll: int = 2,
) -> jnp.ndarray:
    """Deterministically denoise a :func:`stochastic_encode`-d latent from
    DDIM-subset step ``t_start`` down to x_0 (reference ddim.py:451-491 —
    the loop there walks ``np.flip(timesteps[:t_start])`` with eta=0)."""
    return ddim_sample(
        eps_fn,
        None,
        x_latent.shape,
        schedule,
        num_steps=num_steps,
        eta=0.0,
        x_T=x_latent,
        t_start=int(t_start),
        unroll=unroll,
    )
