"""Batch-scaling probe: time one CFG UNet step (and optionally VAE/vocoder)
at several batch sizes to find where per-sample cost is minimized.

Usage: python tools/batch_scaling.py [model_name] [--batches 1,2,4,8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_name", nargs="?", default="audioldm_16k_crossattn_t5")
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--stages", default="unet,vae,vocoder")
    args = ap.parse_args()

    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config
    from audioldm2_tpu.diffusion import ddim
    from audioldm2_tpu.diffusion.latent_diffusion import encode_conditioning
    from audioldm2_tpu.models import unet, vae, vocoder

    pipeline.enable_compilation_cache()
    cfg = default_audioldm_config(args.model_name)
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    params = model.ldm.params
    latent_t = int(args.duration * cfg.latent_t_per_second)
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def cast_tree(tree):
        return jax.tree.map(
            lambda a: a.astype(cdtype) if a.dtype == jnp.float32 else a, tree
        )

    stages = args.stages.split(",")
    batches = [int(b) for b in args.batches.split(",")]
    unet_p = cast_tree(params["unet"])
    vae_p = cast_tree(params["vae"])
    voc_p = cast_tree(params["vocoder"])

    print(f"model={args.model_name} latent_T={latent_t} dur={args.duration}s")
    print(f"{'stage':<10}{'batch':>6}{'ms':>10}{'ms/sample':>12}")
    for b in batches:
        batch = model.make_batch("a dog barking in the rain", batchsize=b)
        shape = (b, latent_t, cfg.latent_f_size, cfg.latent_channels)

        if "unet" in stages:
            (y, ctxs, masks), _, _ = jax.jit(
                lambda p, bt: encode_conditioning(p, cfg, bt, 1, 3.5),
                static_argnames=(),
            )(params, batch)
            ctxs_c = [c.astype(cdtype) for c in ctxs]
            y_c = y.astype(cdtype) if y is not None else None
            kv = jax.jit(
                lambda p, c: unet.precompute_cross_kv(p, cfg.unet, c)
            )(unet_p, ctxs_c)
            fused_p = jax.jit(unet.fuse_self_qkv)(unet_p)

            @jax.jit
            def one_step(unet_p, kv, x, t):
                def mfn(xx, tt):
                    eps = unet.apply_unet(
                        unet_p, cfg.unet, xx.astype(cdtype), tt,
                        context_list=ctxs_c, context_mask_list=masks, y=y_c,
                        cross_kv=kv,
                    )
                    return eps.astype(jnp.float32)

                return ddim.cfg_eps_fn(mfn, 3.5)(x, t)

            x = jnp.zeros(shape, jnp.float32)
            t = jnp.zeros((b,), jnp.float32)
            ms = timed(one_step, fused_p, kv, x, t) * 1e3
            print(f"{'unet-cfg':<10}{b:>6}{ms:>10.2f}{ms / b:>12.3f}", flush=True)

        if "vae" in stages:
            z = jnp.zeros(shape, jnp.float32)
            dec = jax.jit(lambda p, z: vae.decode(p, cfg.vae, z.astype(cdtype)))
            ms = timed(dec, vae_p, z) * 1e3
            print(f"{'vae-dec':<10}{b:>6}{ms:>10.2f}{ms / b:>12.3f}", flush=True)

        if "vocoder" in stages:
            mel_t = latent_t * cfg.vae.downsample_factor
            mel = jnp.zeros((b, mel_t, cfg.preprocessing.n_mel_channels), jnp.float32)
            voc = jax.jit(
                lambda p, m: vocoder.apply_vocoder(p, cfg.vocoder, m.astype(cdtype))
            )
            ms = timed(voc, voc_p, mel) * 1e3
            print(f"{'vocoder':<10}{b:>6}{ms:>10.2f}{ms / b:>12.3f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
