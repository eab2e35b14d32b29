#!/bin/sh
# Tunnel-outage-tolerant training driver: probe the TPU, and while it is
# reachable run train.py (auto-resume picks up from the newest checkpoint).
# Survives relay flaps (TPU_NOTES round-2 session-5, outage mode) AND
# in-run hangs: a relay flap mid-device-call leaves the client blocked
# forever at 0% CPU (round-3: 48 min silent at epoch 119 with the tunnel
# back up).  The monitor kills the trainer when its cumulative CPU time
# is frozen for STALL_S seconds; the loop then relaunches and auto-resume
# loses at most the epochs since the newest checkpoint (saved every epoch).
#   sh scripts/train_watchdog.sh <duration_s> <config> <logfile> [stall_s]
set -u
DUR=${1:-21600}
CFG=${2:-configs/CVPR_inverse_scaling.yaml}
LOG=${3:-/tmp/train_watch.log}
STALL_S=${4:-900}
cd /root/repo || exit 1
END=$(($(date +%s) + DUR))
while [ "$(date +%s)" -lt "$END" ]; do
    if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        left=$((END - $(date +%s)))
        [ "$left" -gt 120 ] || break
        echo "=== $(date -u +%H:%M:%S) tunnel up, training for <=${left}s ===" >> "$LOG"
        python -u train.py --config "$CFG" >> "$LOG" 2>&1 &
        TPID=$!
        # published so bench.py can SIGSTOP the trainer during measurement
        echo "$TPID" > /tmp/upcc_train.pid
        last_cpu=-1 idle=0
        while kill -0 "$TPID" 2>/dev/null; do
            if [ "$(date +%s)" -ge "$END" ]; then
                echo "=== $(date -u +%H:%M:%S) budget spent, stopping trainer ===" >> "$LOG"
                kill "$TPID" 2>/dev/null; sleep 30
                kill -9 "$TPID" 2>/dev/null
                break
            fi
            sleep 60
            # bench pause: bench.py SIGSTOPs the trainer and drops a
            # marker; skip stall accounting while it is present.  A
            # marker older than 1 h means the bench died un-resumed —
            # clear it and SIGCONT so training continues.
            if [ -f /tmp/upcc_bench_pause ]; then
                m_age=$(( $(date +%s) - $(stat -c %Y /tmp/upcc_bench_pause) ))
                if [ "$m_age" -ge 3600 ]; then
                    echo "=== stale bench pause (${m_age}s), resuming trainer ===" >> "$LOG"
                    rm -f /tmp/upcc_bench_pause
                    kill -CONT "$TPID" 2>/dev/null
                fi
                idle=0
                last_cpu=-1
                continue
            fi
            # utime+stime across all threads; frozen => hung client.
            # Near-frozen counts too: a dead-stream hang still drips a few
            # ticks/min (observed 27 ticks in 12 min, round-3 session 7),
            # which would reset a strict equality check forever.
            cpu=$(awk '{print $14 + $15}' "/proc/$TPID/stat" 2>/dev/null) || cpu=""
            [ -n "$cpu" ] || break
            if [ "$last_cpu" -ge 0 ] && [ $((cpu - last_cpu)) -le 5 ]; then
                idle=$((idle + 60))
            else
                idle=0
            fi
            last_cpu=$cpu
            if [ "$idle" -ge "$STALL_S" ]; then
                echo "=== $(date -u +%H:%M:%S) stall: trainer cputime frozen ${idle}s, killing ===" >> "$LOG"
                kill "$TPID" 2>/dev/null; sleep 30
                kill -9 "$TPID" 2>/dev/null
                break
            fi
        done
        wait "$TPID" 2>/dev/null
        echo "=== $(date -u +%H:%M:%S) trainer exited rc=$? ===" >> "$LOG"
        rm -f /tmp/upcc_train.pid  # never leave a stale PID for bench.py
    else
        echo "=== $(date -u +%H:%M:%S) tunnel down ===" >> "$LOG"
    fi
    sleep 60
done
