#!/bin/sh
# Round-4 last TPU stage: the 'model' vox11 sequence (its r4c attempt ran
# before the decode-group level-0 cap landed), then the definitive plot/BD
# refresh.  Gated to leave the chip free before the driver's round-end
# bench (~18:36 UTC).
set -x
cd /root/repo || exit 1
sod() { date -u +'%H %M %S' | awk '{print $1*3600 + $2*60 + $3}'; }

while [ ! -f /tmp/r4d_done ]; do sleep 30; done

if [ "$(sod)" -lt 65100 ]; then   # start gate 18:05 UTC
    timeout 1500 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 3 --sequences model --append --no_renders \
        > /tmp/r4e_eval_model.log 2>&1
    git add -f results/CVPR_inverse_scaling/test.csv
    git commit -m "vox11 3x3 sweep: model (block 512, level-0 group cap)" \
        >> /tmp/r4_git.log 2>&1
fi

timeout 1800 env UPCC_PLATFORM=cpu python -u plot.py \
    --experiments CVPR_inverse_scaling CVPR_inverse_scaling_coded \
    gpcc_native --anchor gpcc_native --anchor_points pareto \
    > /tmp/r4e_plot.log 2>&1
git add -f results/plots
git commit -m "Definitive round-4 plots + BD deltas (8-sequence learned coverage)" \
    >> /tmp/r4_git.log 2>&1

touch /tmp/r4e_done
