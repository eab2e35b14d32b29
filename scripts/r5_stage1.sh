#!/bin/sh
# Round-5 stage 1: residual-color-layer validation on the real chip.
#   1. longdress 5x5 sweep with the residual layer (scratch experiment
#      r5_resid_ab, epoch-192 bf16 weights) -> BD check vs gpcc_native
#   2. PCQM per-feature probe (ours vs anchor) for the metric analysis
# Crash-safe: logs to /tmp, commits the scratch results at the end.
set -x
cd /root/repo || exit 1
timeout 4200 python -u evaluate.py --experiments r5_resid_ab \
    --q_steps 5 --sequences longdress --no_renders \
    > /tmp/r5_stage1_sweep.log 2>&1
timeout 2400 python -u scripts/analyze_pcqm.py --features \
    > /tmp/r5_stage1_pcqm.log 2>&1
git add -A results/r5_resid_ab results/plots/pcqm_features.csv 2>/dev/null
git commit -q -m "Stage-1 probe: longdress 5x5 with residual color layer + PCQM features" 2>/dev/null
echo DONE
