#!/bin/sh
# Tunnel-outage-tolerant training driver: probe the TPU, and while it is
# reachable run train.py (auto-resume picks up from the newest checkpoint).
# Survives relay flaps (TPU_NOTES round-2 session-5, outage mode).
#   sh scripts/train_watchdog.sh <duration_s> <config> <logfile>
set -u
DUR=${1:-21600}
CFG=${2:-configs/CVPR_inverse_scaling.yaml}
LOG=${3:-/tmp/train_watch.log}
cd /root/repo || exit 1
END=$(($(date +%s) + DUR))
while [ "$(date +%s)" -lt "$END" ]; do
    if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        left=$((END - $(date +%s)))
        [ "$left" -gt 120 ] || break
        echo "=== $(date -u +%H:%M:%S) tunnel up, training for <=${left}s ===" >> "$LOG"
        timeout -k 30 "$left" python -u train.py --config "$CFG" >> "$LOG" 2>&1
        echo "=== $(date -u +%H:%M:%S) trainer exited rc=$? ===" >> "$LOG"
    else
        echo "=== $(date -u +%H:%M:%S) tunnel down ===" >> "$LOG"
    fi
    sleep 60
done
