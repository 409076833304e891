"""A/B int8 UNet ST-weight streaming vs bf16 inside the DDIM step, plus the
quantization error on the final latents.

Usage: python tools/ab_int8.py [--batch 1] [--steps 20] [--lnmm]

CAVEAT: at random init the latent-error readout is structurally ZERO — the
UNet's output conv is zero-init (reference openaimodel.py:817 zero_module),
so eps≡0 and the sampler trajectory is weight-independent. The timing A/B
is valid; the quantization-error measurement needs converted real weights.
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
    ap.add_argument("--lnmm", action="store_true",
                    help="also enable the fused LN+matmul kernels")
    args = ap.parse_args()

    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config
    from audioldm2_tpu.diffusion import ddim
    from audioldm2_tpu.diffusion.latent_diffusion import encode_conditioning
    from audioldm2_tpu.models import unet
    from audioldm2_tpu.ops import nn

    pipeline.enable_compilation_cache()
    nn.USE_PALLAS_LNMM = args.lnmm
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
    unet_pq = jax.jit(unet.quantize_st_linears)(unet_p)
    # ResBlock 3x3 convs — the dominant per-step weight stream
    unet_pq = jax.jit(unet.quantize_resblock_convs)(unet_pq)
    shape = (b, latent_t, cfg.latent_f_size, cfg.latent_channels)
    schedule = model.ldm.schedule

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
        return ddim.ddim_sample(eps_fn, key, shape, schedule, num_steps=args.steps)

    key = jax.random.PRNGKey(0)
    outs = {}
    for name, p in (("bf16", unet_p), ("int8", unet_pq)):
        outs[name] = jax.block_until_ready(scan_fn(p, kv, key))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(scan_fn(p, kv, key))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        p50 = ts[len(ts) // 2]
        print(
            f"weights={name} lnmm={args.lnmm}: {p50 * 1e3:.1f} ms for "
            f"{args.steps} steps ({p50 / args.steps * 1e3:.2f} ms/step) "
            f"batch={b}",
            flush=True,
        )
    d = jnp.abs(outs["int8"] - outs["bf16"])
    ref = jnp.abs(outs["bf16"]).mean()
    print(f"int8 latent error: mean {float(d.mean()):.3e} "
          f"max {float(d.max()):.3e} (latent scale {float(ref):.3e})")


if __name__ == "__main__":
    sys.exit(main())
