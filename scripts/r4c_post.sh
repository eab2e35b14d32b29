#!/bin/sh
# Round-4 post-chain stage: rerun the vox11 sweeps with the encode-group
# point cap (commit 1350f56 — the chain's stage-6 attempts all OOM'd at
# compile before the fix), then the production-quality ablation and a
# final plot/BD refresh.  Waits for the r4b chain's done marker first.
# Gates keep the TPU free well before the driver's round-end bench.
set -x
cd /root/repo || exit 1
sod() { date -u +'%H %M %S' | awk '{print $1*3600 + $2*60 + $3}'; }

while [ ! -f /tmp/r4_chain_done ]; do sleep 30; done

# 1. vox11 3x3 sweeps, one commit per sequence (start gate 17:05 UTC)
for SEQ in basketball_player dancer exercise model; do
    [ "$(sod)" -lt 61500 ] || break
    timeout 2700 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 3 --sequences "$SEQ" --append --no_renders \
        > "/tmp/r4c_eval_$SEQ.log" 2>&1
    git add -f results/CVPR_inverse_scaling/test.csv
    git commit -m "vox11 3x3 sweep: $SEQ (block 512, encode-group cap fix)" \
        >> /tmp/r4_git.log 2>&1
done

# 2. candidate-set ablation at production quality (start gate 17:45 UTC)
if [ "$(sod)" -lt 63900 ]; then
    timeout 2100 python -u scripts/abl_prod_eval.py > /tmp/r4c_abl.log 2>&1
    git add docs/ABLATION.md
    git commit -m "Ablation re-validated with round-4 flagship weights" \
        >> /tmp/r4_git.log 2>&1
fi

# 3. final plots + BD (CPU only; never blocks the TPU)
timeout 1800 env UPCC_PLATFORM=cpu python -u plot.py \
    --experiments CVPR_inverse_scaling CVPR_inverse_scaling_coded \
    gpcc_native --anchor gpcc_native --anchor_points pareto \
    > /tmp/r4c_plot.log 2>&1
git add -f results/plots
git commit -m "Final round-4 plots + BD deltas (incl. vox11 learned rows)" \
    >> /tmp/r4_git.log 2>&1

touch /tmp/r4c_done
