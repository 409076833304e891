"""A/B the time-folded MRF vocoder vs the plain channels-last path.

Usage: python tools/ab_vocoder.py [model_name] [--batch 1] [--mel-t 1024]
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
    ap.add_argument("--mel-t", type=int, default=1024)
    args = ap.parse_args()

    from audioldm2_tpu import pipeline
    from audioldm2_tpu.config import default_audioldm_config
    from audioldm2_tpu.models import vocoder

    pipeline.enable_compilation_cache()
    cfg = default_audioldm_config(args.model_name)
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)["vocoder"]
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    mel = jax.random.normal(
        jax.random.PRNGKey(1),
        (args.batch, args.mel_t, cfg.vocoder.num_mels),
        jnp.bfloat16,
    )

    folded = jax.jit(lambda p: vocoder.fold_vocoder_params(p, cfg.vocoder))(
        params
    )

    outs = {}
    for flag in (False, True):
        vocoder.USE_FOLDED_MRF = flag
        if flag:
            fn = jax.jit(
                lambda p, m: vocoder.apply_vocoder(p, cfg.vocoder, m, folded=folded)
            )
        else:
            fn = jax.jit(lambda p, m: vocoder.apply_vocoder(p, cfg.vocoder, m))
        out = jax.block_until_ready(fn(params, mel))
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, mel))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        p50 = ts[len(ts) // 2]
        outs[flag] = out
        print(
            f"folded={flag}: {p50 * 1e3:.2f} ms (batch={args.batch}, "
            f"mel_T={args.mel_t}, {cfg.vocoder.sampling_rate} Hz)",
            flush=True,
        )
    err = float(jnp.max(jnp.abs(outs[True].astype(jnp.float32)
                                - outs[False].astype(jnp.float32))))
    print(f"max |folded - plain|: {err:.3e}")


if __name__ == "__main__":
    sys.exit(main())
