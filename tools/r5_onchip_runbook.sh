#!/bin/bash
# Round-5 on-chip sequence (ONE host core + one chip: everything serializes).
# Run AFTER the smoke lane (AUDIOLDM2_TEST_TPU=1 pytest -m tpu) is green.
# Decisions (defaults, PERF.md tables) happen after reading the log.
set -x
LOG=${LOG:-/tmp/r5_onchip.log}
cd /root/repo
exec >"$LOG" 2>&1

echo "=== 1a. headline t5 batch=4 (CFG-b8): tiled/cat OFF (round-3 dispatch) ==="
AUDIOLDM2_PALLAS_RESBLOCK_TILED=0 AUDIOLDM2_PALLAS_RESBLOCK_CAT=0 \
  timeout 2400 python tools/ab_step.py audioldm_16k_crossattn_t5 --batch 4 --steps 20

echo "=== 1b. headline t5 batch=4 (CFG-b8): tiled/cat ON ==="
timeout 2400 python tools/ab_step.py audioldm_16k_crossattn_t5 --batch 4 --steps 20

echo "=== 2a. large-1150k batch=3 (CFG-b6): tiled/cat OFF ==="
AUDIOLDM2_PALLAS_RESBLOCK_TILED=0 AUDIOLDM2_PALLAS_RESBLOCK_CAT=0 \
  timeout 2400 python tools/ab_step.py audioldm2-full-large-1150k --batch 3 --steps 20

echo "=== 2b. large-1150k batch=3 (CFG-b6): tiled/cat ON ==="
timeout 2400 python tools/ab_step.py audioldm2-full-large-1150k --batch 3 --steps 20

echo "=== 3a. t5 batch=1 (CFG-b2): default dispatch (attention=XLA below threshold) ==="
timeout 2400 python tools/ab_step.py audioldm_16k_crossattn_t5 --batch 1 --steps 20

echo "=== 3b. t5 batch=1 (CFG-b2): Pallas attention forced ON ==="
AUDIOLDM2_PALLAS_ATTENTION=1 \
  timeout 2400 python tools/ab_step.py audioldm_16k_crossattn_t5 --batch 1 --steps 20

echo "=== 4. attention v7 vs v5 A/B ==="
timeout 2400 python tools/ab_attn_variants.py --steps 100

echo "=== 5. large-1150k n=3 stage profile ==="
timeout 2400 python tools/profile_stages.py audioldm2-full-large-1150k --n-gen 3

echo "=== runbook done ==="
