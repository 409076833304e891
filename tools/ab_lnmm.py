"""A/B the fused LN+matmul / GEGLU+matmul Pallas kernels vs the XLA
composition inside the DDIM step.

Usage: python tools/ab_lnmm.py [--batch 1] [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_name", nargs="?", default="audioldm_16k_crossattn_t5")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config
    from audioldm2_tpu.diffusion import ddim
    from audioldm2_tpu.diffusion.latent_diffusion import encode_conditioning
    from audioldm2_tpu.models import unet
    from audioldm2_tpu.ops import nn

    pipeline.enable_compilation_cache()
    cfg = default_audioldm_config(args.model_name)
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    params = model.ldm.params
    latent_t = int(10.0 * cfg.latent_t_per_second)
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    b = args.batch

    cast = lambda t: jax.tree.map(
        lambda a: a.astype(cdtype) if a.dtype == jnp.float32 else a, t
    )
    batch = model.make_batch("a dog barking in the rain", batchsize=b)
    (y, ctxs, masks), _, _ = jax.jit(
        lambda p, bt: encode_conditioning(p, cfg, bt, 1, 3.5)
    )(params, batch)
    unet_p = cast(params["unet"])
    ctxs_c = [c.astype(cdtype) for c in ctxs]
    y_c = y.astype(cdtype) if y is not None else None
    kv = jax.jit(lambda p, c: unet.precompute_cross_kv(p, cfg.unet, c))(
        unet_p, ctxs_c
    )
    unet_p = jax.jit(unet.fuse_self_qkv)(unet_p)
    shape = (b, latent_t, cfg.latent_f_size, cfg.latent_channels)
    schedule = model.ldm.schedule

    def build(flag):
        nn.USE_PALLAS_LNMM = flag

        @jax.jit
        def scan_fn(unet_p, kv, key):
            def mfn(x, t):
                eps = unet.apply_unet(
                    unet_p, cfg.unet, x.astype(cdtype), t,
                    context_list=ctxs_c, context_mask_list=masks, y=y_c,
                    cross_kv=kv,
                )
                return eps.astype(jnp.float32)

            eps_fn = ddim.cfg_eps_fn(mfn, 3.5)
            return ddim.ddim_sample(
                eps_fn, key, shape, schedule, num_steps=args.steps
            )

        return scan_fn

    key = jax.random.PRNGKey(0)
    outs = {}
    for flag in (False, True):
        fn = build(flag)
        outs[flag] = jax.block_until_ready(fn(unet_p, kv, key))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(unet_p, kv, key))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        p50 = ts[len(ts) // 2]
        print(
            f"pallas_lnmm={flag}: {p50 * 1e3:.1f} ms for {args.steps} steps"
            f" ({p50 / args.steps * 1e3:.2f} ms/step) batch={b}",
            flush=True,
        )
    err = float(jnp.max(jnp.abs(outs[True] - outs[False])))
    print(f"max |lnmm - xla| over final latents: {err:.3e}")


if __name__ == "__main__":
    sys.exit(main())
