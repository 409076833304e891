"""Multi-chip inference serving over a dp x tp mesh.

The reference serves on exactly one device (reference pipeline.py:144-150);
here a batch of prompts (x candidates) shards over the mesh's ``dp`` axis:
every batch-leading array shards, and GSPMD partitions the whole
conditioning -> DDIM -> decode -> vocoder program. The CFG stacking
(uncond || cond) doubles the leading axis, so ``2 * batch * n_gen`` must be
divisible by the dp size.

``tp > 1`` additionally shards attention/FF weights megatron-style
(column/row splits from :func:`audioldm2_tpu.parallel.mesh.param_shardings`)
so a single prompt's UNet step spreads over tp chips — the latency-bound
layout for the large family. dp-only is the throughput-serving default.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioldm2_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    sharded_leaf_count,
)


class ShardedGenerator:
    """Wraps an AudioLDM2 model for dp(x tp)-sharded batch serving."""

    def __init__(self, model, mesh: Mesh = None, tp: Optional[int] = None):
        self.model = model
        self.mesh = mesh or make_mesh(tp=tp or 1)
        self.dp = int(self.mesh.shape["dp"])
        self.tp = int(self.mesh.shape.get("tp", 1))
        self._replicated = NamedSharding(self.mesh, P())
        self._batched = NamedSharding(self.mesh, P("dp"))
        # place params once: replicated over dp; attention/FF weights
        # column/row-split over tp when tp > 1
        if self.tp > 1:
            self.n_sharded = sharded_leaf_count(model.ldm.params)
            if self.n_sharded == 0:
                # The spec rules match by param-tree key names; a rename
                # would silently degrade tp>1 to replication. Fail loudly.
                raise RuntimeError(
                    "tp>1 requested but the sharding rules "
                    "(parallel/mesh._param_spec) matched 0 tensors — the "
                    "param-tree key names drifted from the spec table"
                )
            self.params = jax.device_put(
                model.ldm.params, param_shardings(self.mesh, model.ldm.params)
            )
        else:
            self.n_sharded = 0
            self.params = jax.device_put(model.ldm.params, self._replicated)
        self.voc_folded = (
            jax.device_put(model.ldm._voc_folded, self._replicated)
            if model.ldm._voc_folded is not None
            else None
        )

    def generate(self, texts, key, duration: float = 10.0, n_gen: int = 1,
                 guidance: float = 3.5, ddim_steps: int = 200, **kw):
        """texts: list of prompts. Returns waveform [len(texts)*n_gen, N]."""
        b = len(texts)
        assert (b * n_gen) % self.dp == 0, (
            f"batch*n_gen ({b * n_gen}) must divide over dp={self.dp}"
        )
        model = self.model
        batch = {}
        for text in texts:
            one = model.make_batch(text, batchsize=1)
            for k, v in one.items():
                batch.setdefault(k, []).append(v)
        batch = {
            k: np.concatenate(v, axis=0) if k.count("uncond") == 0 else v[0]
            for k, v in batch.items()
        }
        batch = {
            k: jax.device_put(v, self._batched if v.shape[0] == b else self._replicated)
            for k, v in batch.items()
        }

        latent_t = int(duration * model.cfg.latent_t_per_second)
        from audioldm2_tpu.diffusion.latent_diffusion import _generate_impl
        import functools

        fn = jax.jit(
            functools.partial(
                _generate_impl, cfg=model.cfg, schedule=model.ldm.schedule
            ),
            static_argnames=(
                "latent_t_size", "n_gen", "guidance", "ddim_steps", "ddim_eta",
                "use_mask", "sampler",
            ),
        )
        with jax.set_mesh(self.mesh):
            wav, _ = fn(
                self.params, batch, key,
                latent_t_size=latent_t, n_gen=n_gen, guidance=float(guidance),
                ddim_steps=int(ddim_steps), ddim_eta=1.0, use_mask=False,
                voc_folded=self.voc_folded,
            )
        return np.asarray(wav)


def dryrun_infer(n_devices: int, ddim_steps: int = 2, duration: float = 1.25):
    """Production-geometry sharded-INFERENCE dry run (the train-step analogue
    lives in parallel/train.dryrun).

    Builds the flagship family at its REAL model geometry (UNet ch 128 mult
    [1,2,3,5], FLAN-T5-large conditioner, full VAE + HiFi-GAN — fast
    structural init), shards it dp x tp over the mesh, and runs ONE short
    generate end to end: conditioning -> CFG DDIM scan -> VAE decode ->
    vocoder in a single GSPMD-partitioned program. Asserts the tp rules
    sharded a nonzero number of tensors (guard against silent key-name
    drift) and that every device holds a latent shard.
    """
    import dataclasses
    import os

    os.environ.setdefault("AUDIOLDM2_FAST_INIT", "1")
    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config

    cfg = default_audioldm_config("audioldm_16k_crossattn_t5")
    t5_layers = int(os.environ.get("AUDIOLDM2_DRYRUN_T5_LAYERS", "0"))
    if t5_layers:
        # compile-budget knob: same T5 hidden dims (so every tp sharding
        # rule fires identically per layer), fewer layers
        def shrink(spec):
            if spec.kind == "flan_t5":
                return dataclasses.replace(
                    spec,
                    flan_t5=dataclasses.replace(spec.flan_t5, num_layers=t5_layers),
                )
            return spec

        cfg = dataclasses.replace(
            cfg, conditioners=tuple(shrink(s) for s in cfg.conditioners)
        )
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg, fast=True)
    model = pipeline.AudioLDM2(cfg, params)

    mesh = make_mesh(n_devices, tp=2 if n_devices % 2 == 0 else 1)
    gen = ShardedGenerator(model, mesh=mesh)
    assert gen.tp == 1 or gen.n_sharded > 0
    print(
        f"infer dryrun: mesh {mesh.devices.shape} (dp x tp), "
        f"{gen.n_sharded} tp-sharded params; compiling the production-"
        "geometry GSPMD program (~15 min cold on a single-core host, "
        "persistent-cached thereafter)...",
        flush=True,
    )
    texts = ["a dog barking"] * gen.dp  # one prompt per dp shard
    wav = gen.generate(
        texts, jax.random.PRNGKey(1), duration=duration, n_gen=1,
        ddim_steps=ddim_steps,
    )
    # untrimmed vocoder output: latent_T * vae_downsample * hop samples
    n_samples = int(duration * cfg.preprocessing.sampling_rate)
    assert wav.shape[0] == gen.dp and wav.shape[1] >= n_samples, wav.shape
    assert np.isfinite(wav).all()
    print(
        f"infer dryrun ok: mesh {mesh.devices.shape} (dp x tp), "
        f"{gen.n_sharded} tp-sharded params, flagship geometry "
        f"(ch{cfg.unet.model_channels}, T5-large, latent_T="
        f"{int(duration * cfg.latent_t_per_second)}), "
        f"{ddim_steps}-step CFG DDIM -> VAE -> vocoder, wav {wav.shape}"
    )
