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
    kwargs = dict(
        ddim_steps=steps,
        duration=duration,
        batchsize=1,
        guidance_scale=3.5,
        n_candidate_gen_per_text=1,
    )

    # warmup: trace + compile + first run
    t0 = time.time()
    pipeline.text_to_audio(model, "a dog barking in the rain", seed=1, **kwargs)
    warmup = time.time() - t0

    # timed runs (different seeds so nothing is cached)
    times = []
    for seed in (2, 3, 4):
        t0 = time.time()
        wav = pipeline.text_to_audio(model, "a dog barking in the rain", seed=seed, **kwargs)
        times.append(time.time() - t0)
    best = min(times)

    value = duration / best
    print(
        json.dumps(
            {
                "metric": "seconds-of-audio/sec/chip (10s clip, 200 DDIM steps, CFG)",
                "value": round(value, 3),
                "unit": "x realtime",
                "vs_baseline": round(value / 10.0, 3),
                "detail": {
                    "wall_s_per_10s_clip": round(best, 3),
                    "warmup_s": round(warmup, 1),
                    "all_runs_s": [round(t, 3) for t in times],
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
