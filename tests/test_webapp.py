"""Watchdog parity for the web UI (reference gradio_app.py:460-510:
SIGKILL hung/abandoned runs; VERDICT r2 weak #7)."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import webapp


def test_watchdog_reason_pure():
    f = webapp.watchdog_reason
    # healthy: just started, fresh progress
    assert f(100.0, 90.0, 95.0, 99.0, 3600, 600, 0) is None
    # hard timeout
    r = f(5000.0, 100.0, 4999.0, 4999.0, 3600, 600, 0)
    assert r and "hard" in r
    # stale progress (no update since start + stale window)
    r = f(1000.0, 100.0, 200.0, 999.0, 3600, 600, 0)
    assert r and "stale" in r
    # stale counts from start when no progress file yet (long compile OK)
    assert f(400.0, 100.0, None, 399.0, 3600, 600, 0) is None
    r = f(800.0, 100.0, None, 799.0, 3600, 600, 0)
    assert r and "stale" in r
    # alive (UI poll) timeout only when enabled
    assert f(1000.0, 900.0, 999.0, 100.0, 3600, 600, 0) is None
    r = f(1000.0, 900.0, 999.0, 100.0, 3600, 600, 30)
    assert r and "abandoned" in r
    # not started => never kill
    assert f(1e9, None, None, None, 1, 1, 1) is None


def test_watchdog_kills_hung_process(tmp_path):
    """Integration: a subprocess that never writes progress is SIGKILLed
    once the stale window expires."""
    trial = tmp_path / "trial"
    trial.mkdir()
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    with webapp.LOCK:
        webapp.STATE.update(
            proc=proc, trial_dir=str(trial), started=time.time(),
            killed=None, last_poll=time.time(),
        )
    try:
        webapp._watchdog_loop(
            proc, str(trial), hard_timeout=0, stale_timeout=1,
            alive_timeout=0, interval=0.2,
        )
        assert proc.poll() is not None  # killed
        with webapp.LOCK:
            assert webapp.STATE["killed"] and "stale" in webapp.STATE["killed"]
    finally:
        if proc.poll() is None:
            proc.kill()
        with webapp.LOCK:
            webapp.STATE.update(proc=None, trial_dir=None, started=None,
                                killed=None, last_poll=None)


def test_watchdog_spares_progressing_process(tmp_path):
    """A run that keeps updating its progress file is NOT killed."""
    trial = tmp_path / "trial"
    trial.mkdir()
    prog = trial / "progress"
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(2.0)"])
    with webapp.LOCK:
        webapp.STATE.update(
            proc=proc, trial_dir=str(trial), started=time.time(),
            killed=None, last_poll=time.time(),
        )
    import threading

    stop = threading.Event()

    def beat():
        while not stop.is_set():
            prog.write_text("Generating: 1.0%\n")
            time.sleep(0.2)

    t = threading.Thread(target=beat, daemon=True)
    t.start()
    try:
        webapp._watchdog_loop(
            proc, str(trial), hard_timeout=0, stale_timeout=1,
            alive_timeout=0, interval=0.2,
        )
        # loop exits because the process finished, not because it was killed
        with webapp.LOCK:
            assert webapp.STATE["killed"] is None
        assert proc.returncode == 0
    finally:
        stop.set()
        if proc.poll() is None:
            proc.kill()
        with webapp.LOCK:
            webapp.STATE.update(proc=None, trial_dir=None, started=None,
                                killed=None, last_poll=None)
