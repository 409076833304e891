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

from audioldm2_tpu.parallel.mesh import make_mesh, param_shardings


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
            self.params = jax.device_put(
                model.ldm.params, param_shardings(self.mesh, model.ldm.params)
            )
        else:
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
