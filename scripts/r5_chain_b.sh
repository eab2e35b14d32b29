#!/bin/sh
# Round-5 chain v2: waits for the in-flight longdress 11x11 process, then
# runs the remaining protocol sweeps as BATCHED single processes (one
# compile each; evaluate.py now flushes test.csv after every sequence).
#   nohup sh scripts/r5_chain_b.sh <longdress_pid> [HARD_END_HHMM_UTC] &
set -x
cd /root/repo || exit 1
LD_PID=${1:?longdress evaluate pid}
HARD_END=${2:-0215}
hhmm_s() { echo "$1" | awk '{print int($1/100)*3600 + ($1%100)*60}'; }
sod() { date -u +'%H %M %S' | awk '{print $1*3600 + $2*60 + $3}'; }
END_S=$(hhmm_s "$HARD_END")
left() { now=$(sod); e=$END_S; [ "$e" -lt 43200 ] && e=$((e + 86400)); \
         [ "$now" -lt 43200 ] && now=$((now + 86400)); echo $((e - now)); }
commit() {
    git add -A results/CVPR_inverse_scaling results/CVPR_inverse_scaling_coded \
        results/plots 2>/dev/null
    git commit -q -m "$1" 2>/dev/null
}

# 0. wait for the in-flight longdress 11x11 (old per-seq process)
while kill -0 "$LD_PID" 2>/dev/null; do sleep 30; done
commit "vox10 11x11 protocol sweep with residual color layer: longdress"

# 1. remaining vox10 protocol grids in ONE process (one compile);
#    test.csv flushes after each sequence, commit loop follows the file
if [ "$(left)" -gt 3000 ]; then
    timeout 14400 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 9 --sequences loot redandblack soldier --no_renders \
        --append >> /tmp/r5_vox10.log 2>&1 &
    EV_PID=$!
    while kill -0 "$EV_PID" 2>/dev/null; do
        sleep 120
        commit "vox10 9x9 sweeps (incremental flush)"
        # abandon the batch if the hard end closes in; per-sequence rows
        # already flushed+committed survive
        if [ "$(left)" -lt 900 ]; then kill "$EV_PID" 2>/dev/null; fi
    done
    commit "vox10 9x9 sweeps with residual color layer (loot, redandblack, soldier)"
fi

timeout 1200 python -u plot.py > /tmp/r5_plots1.log 2>&1
commit "Plots + BD after vox10 protocol sweeps"

# 2. vox11 5x5 grids, one process for all four
if [ "$(left)" -gt 3600 ]; then
    timeout 10800 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 5 --sequences basketball_player dancer exercise model \
        --no_renders --append >> /tmp/r5_vox11.log 2>&1 &
    EV_PID=$!
    while kill -0 "$EV_PID" 2>/dev/null; do
        sleep 120
        commit "vox11 5x5 sweeps (incremental flush)"
        if [ "$(left)" -lt 900 ]; then kill "$EV_PID" 2>/dev/null; fi
    done
    commit "vox11 5x5 sweeps with residual color layer"
fi

# 3. coded-geometry re-sweep with the v2 occupancy coder
if [ "$(left)" -gt 2400 ]; then
    timeout 2400 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --geom coded --q_steps 3 --sequences loot longdress --no_renders \
        --append > /tmp/r5_coded.log 2>&1
    commit "Coded-geometry 3x3 re-sweep: occ coder v2 + residual layer"
fi

# 4. PCQM per-feature probe
if [ "$(left)" -gt 1500 ]; then
    timeout 1500 python -u scripts/analyze_pcqm.py --features \
        > /tmp/r5_pcqm.log 2>&1
    git add -A results/plots/pcqm_features.csv 2>/dev/null
    commit "PCQM feature probe: ours vs anchor decomposition"
fi

# 5. final plots + BD
timeout 1200 python -u plot.py > /tmp/r5_plots2.log 2>&1
commit "Final round-5 plots + BD deltas"
echo CHAIN_B_DONE
