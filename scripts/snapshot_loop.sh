#!/bin/sh
# Auto-commit insurance snapshots while a long training run is live.
#
# Round-3 lesson: epochs 173-179 of the flagship resume were LOST because
# the session died between trainer checkpoints and the manual snapshot
# commit (TPU_NOTES round-3 session 7).  The trainer already writes a
# committable bf16 snapshot + meta sidecar every epoch
# (training/trainer.py::_save_checkpoint); this loop just commits it to
# git whenever the recorded epoch advances, so a host re-image can never
# cost more than one epoch of trained state.
#
#   nohup sh scripts/snapshot_loop.sh <duration_s> [experiment] [period_s] [gap]
#
# Commits use explicit pathspecs (git commit -- <paths>) so anything a
# concurrent operator has staged is never swept into a loop commit.
# MIN_GAP epochs between commits bounds git growth (each bf16 blob is
# ~36 MB and does not delta-compress): gap 6 at ~390 s/epoch is one
# commit per ~40 min — no session can lose more than ~one hour of
# training, and an 8 h run adds ~12 blobs.
set -u
DUR=${1:-28800}
EXP=${2:-CVPR_inverse_scaling}
EVERY=${3:-1200}
MIN_GAP=${4:-6}
cd "${UPCC_REPO:-/root/repo}" || exit 1
END=$(($(date +%s) + DUR))
SNAP="results/$EXP/weights_bf16.msgpack"
META="$SNAP.meta.json"
# sed, not python: sitecustomize pre-imports jax into every python
# process on this host (~seconds of startup per invocation)
meta_epoch() { sed -n 's/.*"epoch"[^0-9-]*\(-\{0,1\}[0-9][0-9]*\).*/\1/p' \
    | head -1; }
# seed from the last COMMITTED epoch (not the working tree: an on-disk
# snapshot the trainer wrote before this loop started may itself be
# uncommitted, and must not be mistaken for already-saved state)
last=$(git show "HEAD:$META" 2>/dev/null | meta_epoch)
[ -n "$last" ] || last=-1
echo "snapshot_loop: exp=$EXP every=${EVERY}s last_committed_epoch=$last"
while [ "$(date +%s)" -lt "$END" ]; do
    sleep "$EVERY"
    [ -f "$META" ] || continue
    ep=$(meta_epoch < "$META")
    [ -n "$ep" ] || continue
    [ $((ep - last)) -ge "$MIN_GAP" ] || continue
    # quiescence gate: the bf16 file is written non-atomically once per
    # epoch (~1 s of a ~390 s epoch); skip this tick if it is mid-write.
    [ -f "$SNAP" ] || continue
    mt0=$(stat -c %Y "$SNAP" 2>/dev/null)
    [ -n "$mt0" ] || continue
    age=$(( $(date +%s) - mt0 ))
    [ "$age" -ge 60 ] || continue
    git add -f "$SNAP" "$META" "results/$EXP/val.csv" 2>/dev/null
    # re-stat AFTER the (multi-second, ~36 MB) add: if the trainer began
    # its epoch write mid-add, the index holds a torn blob — skip this
    # tick and let the next one pick up a quiescent snapshot.
    mt1=$(stat -c %Y "$SNAP" 2>/dev/null)
    if [ -z "$mt1" ] || [ "$mt1" != "$mt0" ]; then
        echo "snapshot_loop: snapshot changed during add; skipping tick"
        continue
    fi
    if git commit -q \
        -m "Insurance snapshot: epoch-$ep weights (auto-commit loop)" \
        -- "$SNAP" "$META" "results/$EXP/val.csv" 2>/dev/null; then
        echo "snapshot_loop: committed epoch $ep at $(date -u +%H:%M:%S)"
        last=$ep
    fi
done
# final flush: commit whatever the trainer last wrote, gap or no gap
# (history-growth note: snapshots land on the CURRENT branch because the
# re-image restore path only guarantees main; a prunable sidecar branch
# would shrink clones but risk losing the insurance state it exists for.
# MIN_GAP bounds growth to ~12 blobs per 8 h run.)
ep=$(meta_epoch < "$META" 2>/dev/null)
[ -n "$ep" ] || ep=-1
if [ "$ep" -gt "$last" ]; then
    git add -f "$SNAP" "$META" "results/$EXP/val.csv" 2>/dev/null
    git commit -q -m "Insurance snapshot: epoch-$ep weights (loop flush)" \
        -- "$SNAP" "$META" "results/$EXP/val.csv" 2>/dev/null \
        && echo "snapshot_loop: flushed epoch $ep"
fi
echo "snapshot_loop: budget spent"
