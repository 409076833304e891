"""Benchmark: seconds-of-audio generated per wall-clock second per chip.

Headline (the ONE JSON line's value): the complete text->waveform pipeline
(conditioning -> 200-step DDIM with CFG -> VAE decode -> HiFi-GAN) on the
audioldm_16k_crossattn_t5 slice, batch=4, 10 s clips — matching BASELINE.json
(vs_baseline = value / 10.0; the north-star is >=10x realtime per chip).

The detail block additionally measures EVERY BASELINE.md benchmark config
end-to-end on the real chip:
  - audioldm2-full            (batch=1, 200 steps: GPT-2 gen + T5 + AudioMAE)
  - audioldm2-speech-gigaspeech (TTS --transcription path, 512-token GPT-2 gen)
  - audioldm_48k              (FiLM/CLAP family, 256-mel HiFi-GAN)
  - audioldm2-full-large-1150k (n_candidates=3 + CLAP rerank; + sr_inpainting)
plus MFU for the headline program from XLA's own cost analysis.

Set AUDIOLDM2_BENCH_FAST=1 to measure only the headline config.
"""

import json
import os
import sys
import time

import jax

PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v4": 275e12}


def _peak():
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16.items():
        if k.lower() in kind.lower():
            return v
    return 197e12


def _mfu(model, batch, key, run_kwargs, wall_s):
    """MFU over the sampling loop: XLA cost analysis of ONE CFG UNet step
    (program-level analysis does not multiply the scan body by its trip
    count) x ddim_steps, over measured wall time."""
    import jax.numpy as jnp

    from audioldm2_tpu.diffusion import ddim
    from audioldm2_tpu.diffusion.latent_diffusion import encode_conditioning
    from audioldm2_tpu.models import unet

    try:
        cfg = model.cfg
        params = model.ldm.params
        cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(cdtype) if a.dtype == jnp.float32 else a, t
        )
        (y, ctxs, masks), bsz, _ = jax.jit(
            lambda p, b: encode_conditioning(
                p, cfg, b, run_kwargs["n_gen"], run_kwargs["guidance"]
            )
        )(params, batch)
        unet_p = cast(params["unet"])
        ctxs_c = [c.astype(cdtype) for c in ctxs]
        y_c = y.astype(cdtype) if y is not None else None
        kv = jax.jit(lambda p, c: unet.precompute_cross_kv(p, cfg.unet, c))(
            unet_p, ctxs_c
        )
        unet_p = jax.jit(unet.fuse_self_qkv)(unet_p)
        shape = (
            bsz, run_kwargs["latent_t_size"], cfg.latent_f_size,
            cfg.latent_channels,
        )

        @jax.jit
        def one_step(unet_p, kv, x, t):
            def mfn(xx, tt):
                eps = unet.apply_unet(
                    unet_p, cfg.unet, xx.astype(cdtype), tt,
                    context_list=ctxs_c, context_mask_list=masks, y=y_c,
                    cross_kv=kv,
                )
                return eps.astype(jnp.float32)

            return ddim.cfg_eps_fn(mfn, run_kwargs["guidance"])(x, t)

        x = jnp.zeros(shape, jnp.float32)
        t = jnp.zeros((shape[0],), jnp.float32)
        ca = one_step.lower(unet_p, kv, x, t).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) * run_kwargs["ddim_steps"]
        return flops / wall_s / _peak() if flops else None
    except Exception:
        return None


def _timed_runs(fn, seeds=(2, 3, 4)):
    ts = sorted(fn(s) for s in seeds)
    return ts[len(ts) // 2], ts


def bench_family(name, scenario):
    """Build the family at full size and run its BASELINE scenario.
    Returns a detail dict."""
    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config

    cfg = default_audioldm_config(name)
    t_build0 = time.time()
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    build_s = time.time() - t_build0

    duration = scenario.get("duration", 10.0)
    batch = scenario.get("batchsize", 1)
    n_gen = scenario.get("n_candidates", 1)
    steps = scenario.get("steps", 200)

    def run(seed):
        t0 = time.time()
        pipeline.text_to_audio(
            model,
            scenario.get("text", "a dog barking in the rain"),
            transcription=scenario.get("transcription", ""),
            seed=seed,
            ddim_steps=steps,
            duration=duration,
            batchsize=batch,
            guidance_scale=3.5,
            n_candidate_gen_per_text=n_gen,
        )
        return time.time() - t0

    def run_sr(seed):
        import numpy as np

        from audioldm2_tpu.utils.audio_io import save_wave

        sr = cfg.preprocessing.sampling_rate
        t = np.linspace(0, duration, int(sr * duration), dtype=np.float32)
        wav = (0.3 * np.sin(2 * np.pi * 440 * t))[None, None, :]
        path = "/tmp/bench_sr_input"
        os.makedirs(path, exist_ok=True)
        save_wave(wav, path, name=["bench_in"], samplerate=sr)
        t0 = time.time()
        pipeline.super_resolution_and_inpainting(
            model, scenario.get("text", "restore the audio"),
            original_audio_file_path=os.path.join(path, "bench_in.wav"),
            seed=seed, ddim_steps=steps, duration=duration, batchsize=batch,
            n_candidate_gen_per_text=n_gen,
        )
        return time.time() - t0

    runner = run_sr if scenario.get("mode") == "sr_inpainting" else run
    t0 = time.time()
    runner(1)
    warmup_s = time.time() - t0
    p50, runs = _timed_runs(runner, seeds=scenario.get("seeds", (2, 3)))
    s_audio = batch * duration
    return {
        "p50_wall_s": round(p50, 3),
        "throughput_s_audio_per_s": round(s_audio / p50, 3),
        "x_realtime": round(duration / p50 * batch, 3),
        "warmup_s": round(warmup_s, 1),
        "build_s": round(build_s, 1),
        "runs_s": [round(t, 3) for t in runs],
        "scenario": {k: v for k, v in scenario.items() if k != "seeds"},
    }


def main():
    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config

    pipeline.enable_compilation_cache()
    fast = os.environ.get("AUDIOLDM2_BENCH_FAST") == "1"

    # ------------------------------------------------------------------
    # headline: t5 slice, 10 s clips, 200 DDIM steps
    # ------------------------------------------------------------------
    cfg = default_audioldm_config("audioldm_16k_crossattn_t5")
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)

    duration, steps = 10.0, 200

    def run(batchsize, seed):
        t0 = time.time()
        pipeline.text_to_audio(
            model, "a dog barking in the rain", seed=seed, ddim_steps=steps,
            duration=duration, batchsize=batchsize, guidance_scale=3.5,
            n_candidate_gen_per_text=1,
        )
        return time.time() - t0

    t0 = time.time()
    run(1, seed=1)
    warmup_lat = time.time() - t0
    p50_latency, _ = _timed_runs(lambda s: run(1, s))

    t0 = time.time()
    run(4, seed=1)
    warmup_thr = time.time() - t0
    p50_b4, thr_runs = _timed_runs(lambda s: run(4, s))
    throughput = 4 * duration / p50_b4

    # MFU of the batch=4 compiled program
    batch_arrays = model.make_batch("a dog barking in the rain", batchsize=4)
    mfu = _mfu(
        model, batch_arrays, jax.random.PRNGKey(0),
        dict(latent_t_size=256, n_gen=1, guidance=3.5, ddim_steps=200,
             ddim_eta=1.0, use_mask=False, sampler="ddim"),
        p50_b4,
    )

    detail = {
        "p50_latency_s_per_10s_clip_batch1": round(p50_latency, 3),
        "latency_x_realtime": round(duration / p50_latency, 3),
        "batch4_wall_s": [round(t, 3) for t in thr_runs],
        "warmup_s": [round(warmup_lat, 1), round(warmup_thr, 1)],
        "mfu_batch4_program": round(mfu, 4) if mfu else None,
        "device": str(jax.devices()[0]),
    }
    del model, params

    # ------------------------------------------------------------------
    # the other four BASELINE.md configs
    # ------------------------------------------------------------------
    if not fast:
        families = {
            "audioldm2-full": dict(batchsize=1, n_candidates=1, duration=10.0),
            "audioldm2-speech-gigaspeech": dict(
                batchsize=1, duration=10.0, text="",
                transcription="the quick brown fox jumps over the lazy dog",
            ),
            "audioldm_48k": dict(batchsize=1, duration=10.0),
            "audioldm2-full-large-1150k": dict(
                batchsize=1, n_candidates=3, duration=10.0,
            ),
            "audioldm2-full-large-1150k/sr_inpainting": dict(
                batchsize=1, n_candidates=1, duration=10.0,
                mode="sr_inpainting",
            ),
        }
        fam_detail = {}
        for fam, scenario in families.items():
            name = fam.split("/")[0]
            try:
                fam_detail[fam] = bench_family(name, scenario)
            except Exception as e:  # record, never sink the headline
                fam_detail[fam] = {"error": f"{type(e).__name__}: {e}"}
        detail["families"] = fam_detail

    print(
        json.dumps(
            {
                "metric": "seconds-of-audio/sec/chip (10s clips, 200 DDIM steps, CFG, batch=4)",
                "value": round(throughput, 3),
                "unit": "seconds-of-audio/sec",
                "vs_baseline": round(throughput / 10.0, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
