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


class _FakeProc:
    """Stands in for subprocess.Popen: alive until .finish() is called."""

    def __init__(self, cmd):
        self.cmd = cmd
        self.returncode = None

    def poll(self):
        return self.returncode

    def finish(self, code=0):
        self.returncode = code

    def kill(self):
        self.returncode = -9

    def wait(self):
        return self.returncode


def _reset_state():
    with webapp.LOCK:
        webapp.STATE.update(proc=None, trial_dir=None, started=None, cmd=None,
                            killed=None, last_poll=None, queue=[], done=[])


def test_queue_two_jobs_run_in_order(monkeypatch):
    """Parity-plus over the reference's single global slot (VERDICT r3 #9):
    a second submission queues and starts when the first finishes."""
    _reset_state()
    # the real _start_job_locked spawns a watchdog thread; FakeProc poll()
    # keeps it harmless (no started timeout configured below 4 h)
    j1 = {"cmd": ["job1"], "trial_dir": "/tmp/t1"}
    j2 = {"cmd": ["job2"], "trial_dir": "/tmp/t2"}
    out1 = webapp.submit_job(j1, popen=_FakeProc)
    assert out1 == ("started", None)
    out2 = webapp.submit_job(j2, popen=_FakeProc)
    assert out2 == ("queued", 1)
    # slot busy: pump does nothing
    assert webapp.pump_queue(popen=_FakeProc) is None
    with webapp.LOCK:
        first = webapp.STATE["proc"]
        assert first.cmd == ["job1"]
    first.finish(0)
    started = webapp.pump_queue(popen=_FakeProc)
    assert started is j2
    with webapp.LOCK:
        assert webapp.STATE["proc"].cmd == ["job2"]
        assert webapp.STATE["queue"] == []
        assert webapp.STATE["done"] == [(["job1"], "exit 0")]
    _reset_state()


def test_queue_bounded_and_fifo():
    _reset_state()
    webapp.submit_job({"cmd": ["a"], "trial_dir": "t"}, popen=_FakeProc)
    for i in range(webapp.MAX_QUEUE):
        out = webapp.submit_job({"cmd": [f"q{i}"], "trial_dir": "t"},
                                popen=_FakeProc)
        assert out == ("queued", i + 1)
    outcome, reason = webapp.submit_job({"cmd": ["overflow"], "trial_dir": "t"},
                                        popen=_FakeProc)
    assert outcome == "rejected" and "full" in reason
    _reset_state()


def test_submit_never_jumps_queue():
    """ADVICE r4 (medium): when the slot freed up but earlier jobs are still
    queued, a new POST takes its place BEHIND them — the queue head starts."""
    _reset_state()
    webapp.submit_job({"cmd": ["a"], "trial_dir": "t"}, popen=_FakeProc)
    webapp.submit_job({"cmd": ["b"], "trial_dir": "t"}, popen=_FakeProc)
    with webapp.LOCK:
        webapp.STATE["proc"].finish(0)  # slot free, but "b" is queued
    out = webapp.submit_job({"cmd": ["c"], "trial_dir": "t"}, popen=_FakeProc)
    assert out == ("queued", 1)  # c waits behind b
    with webapp.LOCK:
        assert webapp.STATE["proc"].cmd == ["b"]  # head of queue started
        assert [j["cmd"] for j in webapp.STATE["queue"]] == [["c"]]
    _reset_state()


def test_watchdog_pumps_queue_on_exit():
    """ADVICE r4 (medium): queued jobs advance when the child exits even if
    no browser tab is polling status_text()."""
    _reset_state()
    webapp.submit_job({"cmd": ["first"], "trial_dir": "/tmp/t1"},
                      popen=_FakeProc)
    webapp.submit_job({"cmd": ["second"], "trial_dir": "/tmp/t2"},
                      popen=_FakeProc)
    with webapp.LOCK:
        proc = webapp.STATE["proc"]
    proc.finish(0)
    # drive the watchdog loop directly (the spawned thread uses 5s polls)
    webapp._watchdog_loop(proc, "/tmp/t1", hard_timeout=0, stale_timeout=0,
                          alive_timeout=0, interval=0.01, popen=_FakeProc)
    with webapp.LOCK:
        assert webapp.STATE["proc"].cmd == ["second"]
        assert webapp.STATE["queue"] == []
    _reset_state()


def test_auth_token():
    """Requests carry the token via bearer header, query, or form; missing
    or wrong tokens are refused (no token configured = open)."""
    old = webapp.AUTH_TOKEN
    try:
        webapp.AUTH_TOKEN = None
        assert webapp.authorized({}, {})
        webapp.AUTH_TOKEN = "s3cret"
        assert not webapp.authorized({}, {})
        assert not webapp.authorized({"Authorization": "Bearer wrong"}, {})
        assert webapp.authorized({"Authorization": "Bearer s3cret"}, {})
        assert webapp.authorized({}, {"token": ["s3cret"]})
        assert webapp.authorized({}, {}, {"token": ["s3cret"]})
        assert not webapp.authorized({}, {"token": ["nope"]})
    finally:
        webapp.AUTH_TOKEN = old
