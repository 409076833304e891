"""Op-level XLA trace of the UNet DDIM step — where do the 4.7 ms/step go?

Usage: python tools/trace_unet.py [model_name] [--steps 20]
Prints the aggregated device-op table from utils/profiling.op_table.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_name", nargs="?", default="audioldm_16k_crossattn_t5")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--stage", choices=("unet", "vocoder", "vae"), default="unet")
    args = ap.parse_args()

    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config
    from audioldm2_tpu.diffusion import ddim
    from audioldm2_tpu.diffusion.latent_diffusion import encode_conditioning
    from audioldm2_tpu.models import unet, vae, vocoder
    from audioldm2_tpu.utils import profiling

    pipeline.enable_compilation_cache()
    cfg = default_audioldm_config(args.model_name)
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    params = model.ldm.params
    batch = model.make_batch("a dog barking in the rain", batchsize=args.batch)
    latent_t = int(10.0 * cfg.latent_t_per_second)
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def cast_tree(tree):
        return jax.tree.map(
            lambda a: a.astype(cdtype) if a.dtype == jnp.float32 else a, tree
        )

    shape = (args.batch, latent_t, cfg.latent_f_size, cfg.latent_channels)

    if args.stage == "unet":
        y, ctxs, masks = jax.jit(
            lambda p, b: encode_conditioning(p, cfg, b, 1, 3.5)[0]
        )(params, batch)
        unet_p = cast_tree(params["unet"])
        ctxs_c = [c.astype(cdtype) for c in ctxs]
        y_c = y.astype(cdtype) if y is not None else None
        kv = jax.jit(lambda p, c: unet.precompute_cross_kv(p, cfg.unet, c))(
            unet_p, ctxs_c
        )

        @jax.jit
        def _fn(unet_p, kv, ctxs_c, y_c, key):
            def model_fn(x, t):
                eps = unet.apply_unet(
                    unet_p, cfg.unet, x.astype(cdtype), t,
                    context_list=ctxs_c, context_mask_list=masks, y=y_c,
                    cross_kv=kv,
                )
                return eps.astype(jnp.float32)

            eps_fn = ddim.cfg_eps_fn(model_fn, 3.5)
            return ddim.ddim_sample(
                eps_fn, key, shape, model.ldm.schedule, num_steps=args.steps
            )

        fn = lambda key: _fn(unet_p, kv, ctxs_c, y_c, key)
        arg = jax.random.PRNGKey(0)
    elif args.stage == "vae":
        vae_p = cast_tree(params["vae"])
        _fn = jax.jit(lambda p, z: vae.decode(p, cfg.vae, z.astype(cdtype)))
        fn = lambda z: _fn(vae_p, z)
        arg = jnp.zeros(shape, jnp.float32)
    else:
        voc_p = cast_tree(params["vocoder"])
        mel_t = latent_t * cfg.vae.downsample_factor
        _fn = jax.jit(
            lambda p, m: vocoder.apply_vocoder(p, cfg.vocoder, m.astype(cdtype))
        )
        fn = lambda m: _fn(voc_p, m)
        arg = jnp.zeros(
            (args.batch, mel_t, cfg.preprocessing.n_mel_channels), jnp.float32
        )

    jax.block_until_ready(fn(arg))  # compile + warm
    log_dir = "/tmp/unet_trace"
    with profiling.trace(log_dir):
        jax.block_until_ready(fn(arg))

    rows = profiling.op_table(log_dir, top=40)
    total = sum(ms for _, ms in rows)
    print(f"\nstage={args.stage} steps={args.steps} batch={args.batch}")
    print(f"{'op':<44}{'ms':>9}{'share':>8}")
    for name, ms in rows:
        print(f"{name:<44}{ms:>9.2f}{ms / total:>8.1%}")
    print(f"{'TOTAL (device ops)':<44}{total:>9.2f}")


if __name__ == "__main__":
    sys.exit(main())
