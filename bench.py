"""Benchmark: seconds-of-audio generated per wall-clock second per chip.

Runs the complete text->waveform pipeline (conditioning -> 200-step DDIM with
CFG -> VAE decode -> HiFi-GAN) for a 10 s clip on the real TPU chip, matching
the BASELINE.json headline configuration (audioldm_16k_crossattn_t5 slice,
batch=1, guidance 3.5, n_candidates=1 measured per-candidate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 10.0 — the north-star is >=10x realtime per chip.
"""

import json
import sys
import time

import jax


def main():
    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config

    cfg = default_audioldm_config("audioldm_16k_crossattn_t5")
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)

    duration = 10.0
    steps = 200

    def run(batchsize, seed):
        t0 = time.time()
        pipeline.text_to_audio(
            model,
            "a dog barking in the rain",
            seed=seed,
            ddim_steps=steps,
            duration=duration,
            batchsize=batchsize,
            guidance_scale=3.5,
            n_candidate_gen_per_text=1,
        )
        return time.time() - t0

    # single-clip latency (p50 over 3 runs after compile)
    t0 = time.time()
    run(1, seed=1)
    warmup_lat = time.time() - t0
    lat_runs = sorted(run(1, seed=s) for s in (2, 3, 4))
    p50_latency = lat_runs[1]

    # batched serving throughput: 4 prompts per program (CFG batch 8)
    t0 = time.time()
    run(4, seed=1)
    warmup_thr = time.time() - t0
    thr_runs = sorted(run(4, seed=s) for s in (2, 3, 4))
    throughput = 4 * duration / thr_runs[1]

    print(
        json.dumps(
            {
                "metric": "seconds-of-audio/sec/chip (10s clips, 200 DDIM steps, CFG, batch=4)",
                "value": round(throughput, 3),
                "unit": "seconds-of-audio/sec",
                "vs_baseline": round(throughput / 10.0, 3),
                "detail": {
                    "p50_latency_s_per_10s_clip_batch1": round(p50_latency, 3),
                    "latency_x_realtime": round(duration / p50_latency, 3),
                    "batch4_wall_s": [round(t, 3) for t in thr_runs],
                    "warmup_s": [round(warmup_lat, 1), round(warmup_thr, 1)],
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
