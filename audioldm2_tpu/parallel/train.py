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


# ---------------------------------------------------------------------------
# Full latent-diffusion training step (mel -> VAE encode -> conditioning ->
# eps loss). The reference's training loop is PyTorch-Lightning vestige
# (ddpm.py:944-1014); this is its TPU-native core.
# ---------------------------------------------------------------------------


def full_diffusion_loss(params, cfg: ModelConfig, schedule_consts, batch, key):
    """batch: mel 'fbank' [B, T, M, 1] + tokenized conditioner arrays
    (see models/conditioners.py)."""
    from audioldm2_tpu.diffusion.latent_diffusion import (
        assemble_unet_inputs,
        encode_conditioning,
    )
    from audioldm2_tpu.models import vae as vae_m

    k_enc, k_t, k_n = jax.random.split(key, 3)
    mean, logvar = vae_m.encode_moments(params["vae"], cfg.vae, batch["fbank"])
    z = vae_m.sample_posterior(k_enc, mean, logvar)
    x0 = params["scale_factor"] * z

    (y, contexts, masks), _, _ = encode_conditioning(params, cfg, batch, 1, 1.0)

    b = x0.shape[0]
    t = jax.random.randint(k_t, (b,), 0, schedule_consts["num_timesteps"])
    noise = jax.random.normal(k_n, x0.shape, x0.dtype)
    sqrt_acum = schedule_consts["sqrt_alphas_cumprod"][t][:, None, None, None]
    sqrt_1m = schedule_consts["sqrt_one_minus_alphas_cumprod"][t][:, None, None, None]
    x_noisy = sqrt_acum * x0 + sqrt_1m * noise
    eps = unet_m.apply_unet(params["unet"], cfg.unet, x_noisy, t, contexts, masks, y=y)
    return jnp.mean(jnp.square(eps - noise))


def make_full_train_step(cfg: ModelConfig, optimizer, train_unet_only: bool = True):
    """Full-model training step. With ``train_unet_only`` the first stage and
    conditioners are frozen (the reference freezes them at inference training
    too, ddpm.py:766-771)."""
    schedule = DiffusionSchedule.create(
        cfg.diffusion.timesteps,
        cfg.diffusion.beta_schedule,
        cfg.diffusion.linear_start,
        cfg.diffusion.linear_end,
    )
    consts = {
        "num_timesteps": schedule.num_timesteps,
        "sqrt_alphas_cumprod": jnp.asarray(schedule.sqrt_alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": jnp.asarray(
            schedule.sqrt_one_minus_alphas_cumprod
        ),
    }

    def train_step(params, opt_state, batch, key):
        def loss_fn(unet_params):
            p = dict(params)
            p["unet"] = unet_params
            return full_diffusion_loss(p, cfg, consts, batch, key)

        if train_unet_only:
            loss, grads = jax.value_and_grad(loss_fn)(params["unet"])
            updates, opt_state = optimizer.update(grads, opt_state, params["unet"])
            params = dict(params)
            params["unet"] = optax.apply_updates(params["unet"], updates)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: full_diffusion_loss(p, cfg, consts, batch, key)
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


# ---------------------------------------------------------------------------
# CLAP contrastive loss — TPU-native replacement for the reference's
# torch.distributed.all_gather / horovod feature gathering
# (reference clap/open_clip/loss.py:9-121): features gather across the dp
# axis with jax.lax.all_gather riding ICI.
# ---------------------------------------------------------------------------


def clap_contrastive_loss(audio_emb, text_emb, logit_scale, axis_name=None):
    """audio_emb/text_emb: [B_local, D] L2-normalized; returns scalar loss.

    Inside shard_map/pjit with ``axis_name``, embeddings are all-gathered so
    every device computes the full [B_global, B_global] similarity (the
    reference's gather_features with local_loss=False)."""
    if axis_name is not None:
        audio_all = jax.lax.all_gather(audio_emb, axis_name, tiled=True)
        text_all = jax.lax.all_gather(text_emb, axis_name, tiled=True)
    else:
        audio_all, text_all = audio_emb, text_emb
    logits = logit_scale * audio_all @ text_all.T
    n = logits.shape[0]
    labels = jnp.arange(n)
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return (jnp.mean(loss_a) + jnp.mean(loss_t)) / 2.0
