#!/bin/sh
# Round-3 session-B close-out chain (2026-08-20): runs after the 6.5h
# flagship resume (watchdog gate ends ~06:56 UTC).  Crash-safe: launched
# detached, every stage --appends and git-commits, so losing the driver
# session costs at most one in-flight stage.  Time-gated against the
# ~12:20 UTC session end; later stages are skipped, not squeezed.
set -x
cd /root/repo || exit 1

# 1. wait for the training watchdog to exit (budget-gated inside)
while ps -p "$(cat /tmp/watchdog.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
    sleep 60
done
sleep 10

# 2. committable bf16 snapshot of the final weights + val trail
python scripts/snapshot_weights.py CVPR_inverse_scaling \
    > /tmp/r3b_snapshot.log 2>&1
git add -f results/CVPR_inverse_scaling/weights_bf16.msgpack \
    results/CVPR_inverse_scaling/weights_bf16.msgpack.meta.json \
    results/CVPR_inverse_scaling/val.csv
git commit -m "Final flagship snapshot: post-resume weights + val trail" \
    > /tmp/r3b_git.log 2>&1

# 3. full 11x11 q-grid on the headline sequence (reference protocol,
#    evaluate.py default q_steps=11) — the VERDICT item-4 artifact
if [ "$(date -u +%H%M)" -lt 0915 ]; then
    timeout 9000 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 11 --sequences longdress --append --no_renders \
        > /tmp/r3b_eval_longdress.log 2>&1
    git add results/CVPR_inverse_scaling/test.csv
    git commit -m "Full 11x11 q-grid sweep: longdress with final weights" \
        >> /tmp/r3b_git.log 2>&1
fi

# 4. loot: 11x11 if time allows, else 5x5 refresh
if [ "$(date -u +%H%M)" -lt 0930 ]; then
    timeout 7200 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 11 --sequences loot --append --no_renders \
        > /tmp/r3b_eval_loot.log 2>&1
    git add results/CVPR_inverse_scaling/test.csv
    git commit -m "Full 11x11 q-grid sweep: loot" >> /tmp/r3b_git.log 2>&1
elif [ "$(date -u +%H%M)" -lt 1045 ]; then
    timeout 2700 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 5 --sequences loot --append --no_renders \
        > /tmp/r3b_eval_loot.log 2>&1
    git add results/CVPR_inverse_scaling/test.csv
    git commit -m "5x5 refresh sweep: loot" >> /tmp/r3b_git.log 2>&1
fi

# 5. soldier + redandblack 5x5 refresh (completes the vox10 quartet)
if [ "$(date -u +%H%M)" -lt 1045 ]; then
    timeout 3600 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 5 --sequences soldier redandblack --append --no_renders \
        > /tmp/r3b_eval_vox10b.log 2>&1
    git add results/CVPR_inverse_scaling/test.csv
    git commit -m "5x5 refresh sweeps: soldier, redandblack" \
        >> /tmp/r3b_git.log 2>&1
fi

# 6. one Owlii vox11 sequence at the q corners (block-512 path)
if [ "$(date -u +%H%M)" -lt 1115 ]; then
    timeout 1800 python -u evaluate.py --experiments CVPR_inverse_scaling \
        --q_steps 2 --sequences basketball_player --append --no_renders \
        > /tmp/r3b_eval_vox11.log 2>&1
    git add results/CVPR_inverse_scaling/test.csv
    git commit -m "vox11 corner sweep: basketball_player at block 512" \
        >> /tmp/r3b_git.log 2>&1
fi

# 7. plots + BD deltas vs the native G-PCC anchor (CPU only)
timeout 1800 env JAX_PLATFORMS=cpu python -u plot.py \
    --experiments CVPR_inverse_scaling gpcc_native --anchor gpcc_native \
    --anchor_points pareto \
    > /tmp/r3b_plot.log 2>&1
git add results/plots
git commit -m "Regenerated RD plots + BD deltas with final sweep" \
    >> /tmp/r3b_git.log 2>&1

touch /tmp/r3b_chain_done
