"""scripts/snapshot_loop.sh: auto-commit of training snapshots.

The loop watches results/<exp>/weights_bf16.msgpack(.meta.json) — written
once per epoch by the trainer (training/trainer.py) — and git-commits it
whenever the on-disk epoch is >= MIN_GAP ahead of the last COMMITTED
epoch, so a dead session can never lose more than ~MIN_GAP epochs of
trained state (round-3 lesson: epochs 173-179 were lost to a host
re-image between manual snapshot commits).  At budget end it flushes
whatever the trainer last wrote, gap or no gap.
"""

import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "snapshot_loop.sh")


def _git(repo, *args):
    return subprocess.run(["git", "-C", str(repo), *args], check=True,
                          capture_output=True, text=True).stdout


@pytest.fixture()
def tiny_repo(tmp_path):
    repo = tmp_path / "repo"
    (repo / "results" / "exp").mkdir(parents=True)
    _git(tmp_path, "init", "-q", str(repo))
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    (repo / ".gitignore").write_text("results/\n")
    _git(repo, "add", ".gitignore")
    _git(repo, "commit", "-qm", "init")
    return repo


def _write_snapshot(repo, epoch, age_s=120):
    exp = repo / "results" / "exp"
    snap = exp / "weights_bf16.msgpack"
    snap.write_bytes(b"weights-at-epoch-%d" % epoch)
    (exp / "weights_bf16.msgpack.meta.json").write_text(
        json.dumps({"epoch": epoch, "step": epoch * 10}))
    (exp / "val.csv").write_text("epoch\n%d\n" % epoch)
    # the quiescence gate skips snapshots younger than 60 s (mid-write).
    # +epoch keeps per-epoch mtimes distinct: equal size + equal mtime
    # would make git's stat check treat the rewrite as clean ("racily
    # clean"), which can't happen with real snapshots (epochs are ~390 s
    # apart) but trips a test that rewrites within one second.
    old = os.path.getmtime(snap) - age_s + epoch
    for p in (snap, exp / "weights_bf16.msgpack.meta.json", exp / "val.csv"):
        os.utime(p, (old, old))


def _commit_snapshot(repo, msg):
    _git(repo, "add", "-f", "results/exp/weights_bf16.msgpack",
         "results/exp/weights_bf16.msgpack.meta.json", "results/exp/val.csv")
    _git(repo, "commit", "-qm", msg)


def _run_loop(repo, dur, every=1, gap=6):
    env = dict(os.environ, UPCC_REPO=str(repo))
    return subprocess.run(
        ["sh", SCRIPT, str(dur), "exp", str(every), str(gap)],
        env=env, capture_output=True, text=True, timeout=dur + 30)


def test_commits_when_epoch_gap_reached(tiny_repo):
    _write_snapshot(tiny_repo, 0)
    _commit_snapshot(tiny_repo, "epoch 0")
    _write_snapshot(tiny_repo, 7)  # 7 - 0 >= gap 6 -> periodic commit
    out = _run_loop(tiny_repo, dur=3)
    log = _git(tiny_repo, "log", "--oneline")
    assert "epoch-7 weights (auto-commit loop)" in log, (log, out.stdout,
                                                         out.stderr)
    # committed content is the epoch-7 snapshot, not a stale blob
    blob = _git(tiny_repo, "show", "HEAD:results/exp/weights_bf16.msgpack")
    assert "epoch-7" in blob


def test_below_gap_only_flushes_at_budget_end(tiny_repo):
    _write_snapshot(tiny_repo, 7)
    _commit_snapshot(tiny_repo, "epoch 7")
    _write_snapshot(tiny_repo, 9)  # 9 - 7 < gap 6
    _run_loop(tiny_repo, dur=3)
    log = _git(tiny_repo, "log", "--oneline")
    assert "auto-commit loop" not in log, log
    # ...but budget end flushes so the last epochs are never dropped
    assert "epoch-9 weights (loop flush)" in log, log


def test_mid_write_snapshot_skipped_by_periodic_commit(tiny_repo):
    _write_snapshot(tiny_repo, 0)
    _commit_snapshot(tiny_repo, "epoch 0")
    _write_snapshot(tiny_repo, 8, age_s=0)  # fresh mtime = mid-write
    _run_loop(tiny_repo, dur=2)
    log = _git(tiny_repo, "log", "--oneline")
    assert "auto-commit loop" not in log, log


def test_seeds_from_committed_epoch_not_working_tree(tiny_repo):
    # an uncommitted on-disk snapshot present at loop start must be
    # treated as unsaved state, not as the baseline
    _write_snapshot(tiny_repo, 0)
    _commit_snapshot(tiny_repo, "epoch 0")
    _write_snapshot(tiny_repo, 12)  # written BEFORE the loop starts
    out = _run_loop(tiny_repo, dur=3)
    log = _git(tiny_repo, "log", "--oneline")
    assert "epoch-12 weights (auto-commit loop)" in log, (log, out.stdout)
