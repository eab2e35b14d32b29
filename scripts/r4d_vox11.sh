#!/bin/sh
# Round-4 final stage: the three vox11 sequences that failed before the
# decode-group level-1 cap landed (c0e1b47) — r4c's loop reached 'model'
# with the fixed code; this finishes basketball_player/dancer/exercise,
# then refreshes plots/BD.  Gated to free the TPU before the driver's
# round-end bench (~18:36 UTC).
set -x
cd /root/repo || exit 1
sod() { date -u +'%H %M %S' | awk '{print $1*3600 + $2*60 + $3}'; }

while [ ! -f /tmp/r4c_done ]; do sleep 30; done

for SEQ in basketball_player dancer exercise; do
    [ "$(sod)" -lt 64500 ] || break   # last start 17:55 UTC
    timeout 2100 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 3 --sequences "$SEQ" --append --no_renders \
        > "/tmp/r4d_eval_$SEQ.log" 2>&1
    git add -f results/CVPR_inverse_scaling/test.csv
    git commit -m "vox11 3x3 sweep: $SEQ (block 512, level-1 group cap)" \
        >> /tmp/r4_git.log 2>&1
done

timeout 1800 env UPCC_PLATFORM=cpu python -u plot.py \
    --experiments CVPR_inverse_scaling CVPR_inverse_scaling_coded \
    gpcc_native --anchor gpcc_native --anchor_points pareto \
    > /tmp/r4d_plot.log 2>&1
git add -f results/plots
git commit -m "Final round-4 plots + BD deltas (full vox11 coverage)" \
    >> /tmp/r4_git.log 2>&1

touch /tmp/r4d_done
