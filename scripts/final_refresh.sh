#!/bin/sh
# End-of-session artifact refresh: run after training stops, with the TPU
# free.  Sequential (1-CPU host; see TPU_NOTES.md measurement pitfalls).
#   sh scripts/final_refresh.sh [q_steps]
# Logs land in /tmp/refresh_*.log; artifacts in results/.
set -x
cd /root/repo || exit 1
QS=${1:-11}

# 0. committable bf16 weight snapshot of the freshest flagship weights
python scripts/snapshot_weights.py CVPR_inverse_scaling \
    > /tmp/refresh_snapshot.log 2>&1

# 1. RD sweep with the freshest flagship weights (synthetic stand-ins).
#    vox10 at the full reference grid (evaluate.py --q_steps 11 default,
#    reference evaluate.py:76-77); the four Owlii vox11 sequences at a
#    3x3 grid to bound wall time (block 512 protocol).
timeout 10800 python -u evaluate.py --experiments CVPR_inverse_scaling \
    --q_steps "$QS" --sequences loot longdress --append \
    > /tmp/refresh_eval.log 2>&1
timeout 5400 python -u evaluate.py --experiments CVPR_inverse_scaling \
    --q_steps 5 --sequences soldier redandblack --append \
    > /tmp/refresh_eval_vox10b.log 2>&1
timeout 7200 python -u evaluate.py --experiments CVPR_inverse_scaling \
    --q_steps 3 --sequences basketball_player dancer exercise model \
    --append > /tmp/refresh_eval_vox11.log 2>&1

# 1b. lossless-geometry (coded occupancy) sweep: a 3x3 grid suffices —
#     geometry is exact at every q, only the rate/color trade moves.
#     Writes results/CVPR_inverse_scaling_coded/test.csv.
timeout 5400 python -u evaluate.py --experiments CVPR_inverse_scaling \
    --q_steps 3 --sequences loot longdress --geom coded --append \
    > /tmp/refresh_eval_coded.log 2>&1

# 2. plots + BD deltas (CPU only)
timeout 1800 env JAX_PLATFORMS=cpu python -u plot.py \
    --experiments CVPR_inverse_scaling CVPR_inverse_scaling_coded \
    gpcc_native --anchor gpcc_native --anchor_points pareto \
    > /tmp/refresh_plot.log 2>&1

# 3. official bench (median of best 5 of 7)
timeout 3600 python -u bench.py > /tmp/refresh_bench.log 2>&1

# 4. streaming + simulcast throughput numbers for TPU_NOTES
timeout 3600 python -u scripts/prof_stream.py > /tmp/refresh_stream.log 2>&1
timeout 1800 python -u scripts/bench_simulcast.py > /tmp/refresh_simulcast.log 2>&1

tail -2 /tmp/refresh_bench.log

# results/ is gitignored: the refreshed artifacts must be force-added.
# git add -f results/CVPR_inverse_scaling/{test.csv,val.csv,weights_bf16.msgpack,weights_bf16.msgpack.meta.json} \
#            results/gpcc_native/test.csv results/plots
