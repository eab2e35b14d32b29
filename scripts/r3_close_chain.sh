#!/bin/sh
# Round-3 close-out chain v2 (2026-08-19): resumes the interrupted final
# refresh after the loot 5x5 sweep finishes.  Crash-safe: launched
# detached; every stage --appends so a kill loses at most one in-flight
# sequence.  Time-gated so plots always land before the ~19:21 UTC round
# end; later stages are skipped, not squeezed.
set -x
cd /root/repo || exit 1

# 1. wait for the running loot sweep (child of the setsid launcher)
while ps -p "$(cat /tmp/r3_eval_child.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
    sleep 20
done

# 2. longdress 5x5 (replaces its stale epoch-129 rows)
timeout 2700 python -u evaluate.py --experiments CVPR_inverse_scaling \
    --q_steps 5 --sequences longdress --append --no_renders \
    > /tmp/r3_eval_longdress.log 2>&1

# 3. optional: soldier + redandblack 3x3 (adds two more BD sequences)
if [ "$(date -u +%H%M)" -lt 1825 ]; then
    timeout 1800 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 3 --sequences soldier redandblack --append --no_renders \
        > /tmp/r3_eval_vox10b.log 2>&1
fi

# 4. optional: one Owlii vox11 sequence at the q corners (block-512 path
#    with the final weights; 2x2 grid bounds wall time)
if [ "$(date -u +%H%M)" -lt 1845 ]; then
    timeout 1500 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 2 --sequences basketball_player --append --no_renders \
        > /tmp/r3_eval_vox11.log 2>&1
fi

# 5. plots + BD deltas vs the native G-PCC anchor (CPU only)
timeout 1500 env JAX_PLATFORMS=cpu python -u plot.py \
    --experiments CVPR_inverse_scaling gpcc_native --anchor gpcc_native \
    --anchor_points pareto \
    > /tmp/r3_plot.log 2>&1

touch /tmp/r3_chain_done
