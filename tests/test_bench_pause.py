"""bench.paused_trainer: the SIGSTOP/SIGCONT protocol around a live trainer.

ADVICE r3 (medium): a trainer exiting between the cmdline check and the
SIGSTOP must not abort the benchmark or leave a stale pause marker (the
marker disables the watchdog's stall detector for up to 1 h).
"""

import importlib.util
import os
import signal
import subprocess
import sys


def _spawn_fake_trainer():
    """A sleeper whose cmdline contains train.py; waits for exec to land
    (cmdline reads empty for the first few ms after fork)."""
    import time
    proc = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(30)", "train.py"])
    for _ in range(200):
        if b"train.py" in open(f"/proc/{proc.pid}/cmdline", "rb").read():
            break
        time.sleep(0.01)
    return proc


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_pidfile_runs_unpaused(tmp_path):
    bench = _load_bench()
    marker = tmp_path / "marker"
    ran = []
    with bench.paused_trainer(str(tmp_path / "absent.pid"), str(marker)):
        ran.append(True)
    assert ran and not marker.exists()


def test_dead_pid_runs_unpaused(tmp_path):
    bench = _load_bench()
    pidfile, marker = tmp_path / "t.pid", tmp_path / "marker"
    pidfile.write_text("999999")
    with bench.paused_trainer(str(pidfile), str(marker)):
        pass
    assert not marker.exists()


def test_trainer_vanishing_before_sigstop_runs_unpaused(tmp_path, monkeypatch):
    """Exit between the cmdline check and the kill: OSError must be absorbed,
    the marker removed, and the body still run (ADVICE r3 bench.py:48)."""
    bench = _load_bench()
    proc = _spawn_fake_trainer()
    try:
        pidfile, marker = tmp_path / "t.pid", tmp_path / "marker"
        pidfile.write_text(str(proc.pid))

        real_kill = os.kill

        def flaky_kill(pid, sig):
            if sig == signal.SIGSTOP:
                raise ProcessLookupError(pid)
            return real_kill(pid, sig)

        monkeypatch.setattr(os, "kill", flaky_kill)
        ran = []
        with bench.paused_trainer(str(pidfile), str(marker)):
            ran.append(True)
        assert ran, "benchmark body must still run when the trainer vanishes"
        assert not marker.exists(), "stale marker would blind the watchdog"
    finally:
        proc.kill()
        proc.wait()


def test_live_trainer_is_stopped_and_resumed(tmp_path):
    bench = _load_bench()
    proc = _spawn_fake_trainer()
    try:
        pidfile, marker = tmp_path / "t.pid", tmp_path / "marker"
        pidfile.write_text(str(proc.pid))
        import time

        def wait_state(want, tries=200):
            for _ in range(tries):
                st = open(f"/proc/{proc.pid}/stat").read().split()[2]
                if st in want:
                    return st
                time.sleep(0.01)
            return st

        with bench.paused_trainer(str(pidfile), str(marker)):
            assert marker.exists()
            state = wait_state(("T",))
            assert state == "T", f"expected stopped trainer, got {state!r}"
        state = wait_state(("S", "R"))
        assert state in ("S", "R"), f"expected resumed trainer, got {state!r}"
        assert not marker.exists()
    finally:
        proc.kill()
        proc.wait()
