"""Exponential moving average of parameters — functional.

Replaces the reference's LitEma shadow-buffer module (reference
``latent_diffusion/modules/ema.py:5-82``): same decay ramp
``min(decay, (1 + updates) / (10 + updates))``, but as a pure pytree
transform that composes with `jax.jit`/`pjit` (EMA state shards exactly
like the params)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: object  # shadow pytree
    updates: jnp.ndarray  # int32 step counter


def init(params) -> EmaState:
    return EmaState(
        params=jax.tree.map(jnp.asarray, params), updates=jnp.zeros((), jnp.int32)
    )


def update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    updates = state.updates + 1
    d = jnp.minimum(decay, (1.0 + updates) / (10.0 + updates))
    new_shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d) * (s - p.astype(s.dtype)), state.params, params
    )
    return EmaState(params=new_shadow, updates=updates)
