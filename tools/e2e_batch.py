"""End-to-end batch-size scaling of the headline config.

Times the full text->waveform pipeline (the exact bench.py program) at
several batch sizes to pick the best headline batch for s-audio/s/chip.

Usage: python tools/e2e_batch.py [model_name] [--batches 4,6,8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_name", nargs="?", default="audioldm_16k_crossattn_t5")
    ap.add_argument("--batches", default="4,6,8")
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config

    pipeline.enable_compilation_cache()
    cfg = default_audioldm_config(args.model_name)
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)

    for bs in [int(b) for b in args.batches.split(",")]:
        def run(seed):
            t0 = time.time()
            pipeline.text_to_audio(
                model, "a dog barking in the rain", seed=seed,
                ddim_steps=args.steps, duration=args.duration, batchsize=bs,
                guidance_scale=3.5, n_candidate_gen_per_text=1,
            )
            return time.time() - t0

        t0 = time.time()
        run(1)
        warm = time.time() - t0
        ts = sorted(run(s) for s in (2, 3))
        p50 = ts[len(ts) // 2]
        print(
            f"batch={bs}: p50 {p50:.3f}s -> "
            f"{bs * args.duration / p50:.3f} s-audio/s/chip "
            f"(warmup {warm:.0f}s, runs {[round(t, 3) for t in ts]})",
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
