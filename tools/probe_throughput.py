"""Probe larger-batch throughput and decompose batch=1 latency.

The headline metric (BASELINE.md: seconds-of-audio/sec/chip at 200 DDIM
steps) does not pin the batch size — this probe measures batch=8 (CFG
batch 16) against the batch=4 headline to decide whether the bench's
headline batch should move, and prints `model.last_timings` for batch=1
to show where the ~1.04 s goes (tokenize / generate / rerank split).

Usage: python tools/probe_throughput.py [--batches 1,4,8] [--steps 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AUDIOLDM2_FAST_INIT", "1")

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--model", default="audioldm_16k_crossattn_t5")
    args = ap.parse_args()

    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config

    pipeline.enable_compilation_cache()
    cfg = default_audioldm_config(args.model)
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)

    duration = 10.0
    for b in [int(x) for x in args.batches.split(",")]:
        def run(seed):
            t0 = time.time()
            pipeline.text_to_audio(
                model, "a dog barking in the rain", seed=seed,
                ddim_steps=args.steps, duration=duration, batchsize=b,
                guidance_scale=3.5, n_candidate_gen_per_text=1,
            )
            return time.time() - t0

        t0 = time.time()
        run(1)
        warm = time.time() - t0
        runs = sorted(run(s) for s in (2, 3, 4))
        p50 = runs[1]
        print(json.dumps({
            "batch": b,
            "p50_wall_s": round(p50, 3),
            "s_audio_per_s": round(b * duration / p50, 3),
            "warmup_s": round(warm, 1),
            "runs_s": [round(t, 3) for t in runs],
            "last_timings": {k: round(v, 4) for k, v in
                             (model.last_timings or {}).items()
                             if isinstance(v, (int, float))},
        }), flush=True)


if __name__ == "__main__":
    main()
