#!/bin/sh
# Round-5 main chain: protocol-density RD sweeps with the residual color
# layer, then coded-mode re-sweep (occ coder v2), PCQM feature probe, and
# final plots+BD.  Crash-safe: every stage --appends and git-commits;
# later stages are time-gated against HARD_END (skipped, not squeezed).
#   nohup sh scripts/r5_chain.sh [HARD_END_HHMM_UTC] &
set -x
cd /root/repo || exit 1
HARD_END=${1:-0215}
hhmm_s() { echo "$1" | awk '{print int($1/100)*3600 + ($1%100)*60}'; }
sod() { date -u +'%H %M %S' | awk '{print $1*3600 + $2*60 + $3}'; }
END_S=$(hhmm_s "$HARD_END")
# handle midnight wrap: treat times before 12:00 as next-day
left() { now=$(sod); e=$END_S; [ "$e" -lt 43200 ] && e=$((e + 86400)); \
         [ "$now" -lt 43200 ] && now=$((now + 86400)); echo $((e - now)); }

commit() {
    git add -A results/CVPR_inverse_scaling results/CVPR_inverse_scaling_coded \
        results/plots 2>/dev/null
    git commit -q -m "$1" 2>/dev/null
}

# 1. vox10 protocol grids (11x11, reference evaluate.py:76-77), residual
#    color layer on
for SEQ in longdress loot redandblack soldier; do
    [ "$(left)" -lt 2700 ] && break
    timeout 7200 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 11 --sequences "$SEQ" --no_renders --append \
        >> /tmp/r5_vox10.log 2>&1
    commit "vox10 11x11 protocol sweep with residual color layer: $SEQ"
done

# checkpoint plots after the vox10 block
timeout 1200 python -u plot.py > /tmp/r5_plots1.log 2>&1
commit "Plots + BD after vox10 protocol sweeps"

# 2. vox11 5x5 grids
for SEQ in basketball_player dancer exercise model; do
    [ "$(left)" -lt 3300 ] && break
    timeout 3600 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 5 --sequences "$SEQ" --no_renders --append \
        >> /tmp/r5_vox11.log 2>&1
    commit "vox11 5x5 sweep with residual color layer: $SEQ"
done

# 3. coded-geometry re-sweep with the v2 occupancy coder (rate honesty)
if [ "$(left)" -gt 2400 ]; then
    timeout 2400 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --geom coded --q_steps 3 --sequences loot longdress --no_renders \
        --append > /tmp/r5_coded.log 2>&1
    commit "Coded-geometry 3x3 re-sweep: occ coder v2 + residual layer"
fi

# 4. PCQM per-feature probe (metric analysis)
if [ "$(left)" -gt 1500 ]; then
    timeout 1500 python -u scripts/analyze_pcqm.py --features \
        > /tmp/r5_pcqm.log 2>&1
    git add -A results/plots/pcqm_features.csv 2>/dev/null
    commit "PCQM feature probe: ours vs anchor decomposition"
fi

# 5. final plots + BD
timeout 1200 python -u plot.py > /tmp/r5_plots2.log 2>&1
commit "Final round-5 plots + BD deltas"
echo CHAIN_DONE
