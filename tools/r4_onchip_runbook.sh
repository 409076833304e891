#!/bin/bash
# Round-4 on-chip validation runbook: run the moment the TPU tunnel returns.
# Everything serializes (ONE host core); all output -> /tmp/r4_onchip.log.
#
#   1. on-TPU Pallas compile+numerics smoke lane (gates the round-4 kernels:
#      tiled ResBlock, concat-free cat kernels)
#   2. A/B: new kernels on/off at the headline (CFG-b8) and the large-1150k
#      n=3 (CFG-b6) geometries
#   3. attention v7 vs v5 A/B
#
# Decisions (promote/revert) happen after reading the log, not in here.
set -x
LOG=/tmp/r4_onchip.log
cd /root/repo
exec >"$LOG" 2>&1

echo "=== 0. device probe ==="
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

echo "=== 1. on-TPU smoke lane ==="
AUDIOLDM2_TEST_TPU=1 timeout 3600 python -m pytest tests/ -m tpu -q

echo "=== 2a. headline t5 batch=4 (CFG-b8): round-3 dispatch (tiled/cat OFF) ==="
AUDIOLDM2_PALLAS_RESBLOCK_TILED=0 AUDIOLDM2_PALLAS_RESBLOCK_CAT=0 \
  timeout 2400 python tools/ab_step.py audioldm_16k_crossattn_t5 --batch 4 --steps 20

echo "=== 2b. headline t5 batch=4 (CFG-b8): round-4 dispatch (tiled/cat ON) ==="
timeout 2400 python tools/ab_step.py audioldm_16k_crossattn_t5 --batch 4 --steps 20

echo "=== 2c. large-1150k batch=3 (CFG-b6 = n_candidates=3): tiled/cat OFF ==="
AUDIOLDM2_PALLAS_RESBLOCK_TILED=0 AUDIOLDM2_PALLAS_RESBLOCK_CAT=0 \
  timeout 2400 python tools/ab_step.py audioldm2-full-large-1150k --batch 3 --steps 20

echo "=== 2d. large-1150k batch=3 (CFG-b6): tiled/cat ON ==="
timeout 2400 python tools/ab_step.py audioldm2-full-large-1150k --batch 3 --steps 20

echo "=== 3. attention v7 vs v5 A/B ==="
timeout 2400 python tools/ab_attn_variants.py --steps 100

echo "=== runbook done ==="
