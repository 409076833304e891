"""Sharded diffusion training step (dp x tp) + multi-chip dry run.

The reference is inference-only (its training loops are PyTorch-Lightning
vestiges); this module provides the TPU-native training core: the standard
eps-prediction diffusion loss (reference ``ddpm.py:1044-1076`` math) as one
``jax.jit`` program over a ``Mesh``, with parameters tensor-parallel over
``tp`` (megatron column/row splits, see mesh.py) and the batch data-parallel
over ``dp``. XLA GSPMD inserts all collectives (gradient psum over dp rides
ICI; activation all-reduces over tp).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audioldm2_tpu.config import ModelConfig, UNetConfig
from audioldm2_tpu.diffusion.schedule import DiffusionSchedule
from audioldm2_tpu.models import unet as unet_m
from audioldm2_tpu.parallel import mesh as mesh_lib


def diffusion_loss(params, cfg: UNetConfig, schedule_consts, batch, key):
    """eps-parameterization MSE (reference ddpm.py:1044-1076)."""
    x0 = batch["latent"]  # [B, T, F, C]
    ctx = batch.get("context")
    mask = batch.get("context_mask")
    b = x0.shape[0]
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (b,), 0, schedule_consts["num_timesteps"])
    noise = jax.random.normal(k_n, x0.shape, x0.dtype)
    sqrt_acum = schedule_consts["sqrt_alphas_cumprod"][t][:, None, None, None]
    sqrt_1macum = schedule_consts["sqrt_one_minus_alphas_cumprod"][t][:, None, None, None]
    x_noisy = sqrt_acum * x0 + sqrt_1macum * noise
    ctx_list = [ctx] if ctx is not None else []
    mask_list = [mask] if mask is not None else []
    eps = unet_m.apply_unet(params, cfg, x_noisy, t, ctx_list, mask_list)
    return jnp.mean(jnp.square(eps - noise))


def make_train_step(cfg: UNetConfig, schedule: DiffusionSchedule, optimizer):
    consts = {
        "num_timesteps": schedule.num_timesteps,
        "sqrt_alphas_cumprod": jnp.asarray(schedule.sqrt_alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": jnp.asarray(
            schedule.sqrt_one_minus_alphas_cumprod
        ),
    }

    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(p, cfg, consts, batch, key)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def dryrun(n_devices: int) -> None:
    """Create an n-device mesh, jit the FULL sharded training step (dp+tp
    param/batch shardings) on tiny shapes, and run ONE step."""
    mesh = mesh_lib.make_mesh(n_devices)

    cfg = UNetConfig(
        in_channels=4,
        out_channels=4,
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=(2,),
        channel_mult=(1, 2),
        num_head_channels=16,
        context_dims=(32,),
    )
    schedule = DiffusionSchedule.create()
    optimizer = optax.adamw(1e-4)

    params = unet_m.init_unet(jax.random.PRNGKey(0), cfg)
    p_shard = mesh_lib.param_shardings(mesh, params)
    params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(params)

    dp = mesh.devices.shape[0]
    b = 2 * dp
    batch = {
        "latent": np.zeros((b, 16, 8, 4), np.float32),
        "context": np.zeros((b, 6, 32), np.float32),
        "context_mask": np.ones((b, 6), np.float32),
    }
    b_shard = mesh_lib.batch_sharding(mesh)
    batch = {k: jax.device_put(v, b_shard) for k, v in batch.items()}

    train_step = make_train_step(cfg, schedule, optimizer)
    step = jax.jit(train_step, donate_argnums=(0, 1))
    with jax.set_mesh(mesh):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(1)
        )
        loss.block_until_ready()
    assert np.isfinite(float(loss)), loss
    print(
        f"dryrun ok: mesh {mesh.devices.shape} (dp x tp), one train step, "
        f"loss={float(loss):.4f}"
    )
