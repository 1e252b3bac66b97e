"""Heartbeat liveness thread (utils/heartbeat.py).

The queue watchdog kills chip jobs after 900 s of log silence; the
heartbeat thread keeps CLIs alive through silent compiles/evals. Off the
axon platform it must stay quiet unless forced, and repeated CLI mains in
one process (run_tables_paper) must share one thread.
"""
import threading

from cindm_tpu.utils import heartbeat


def test_noop_off_axon(monkeypatch, capsys):
    monkeypatch.delenv("CINDM_HEARTBEAT", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(heartbeat, "_started", [])
    assert heartbeat.start_heartbeat() is None
    assert capsys.readouterr().out == ""


def test_forced_off(monkeypatch):
    monkeypatch.setenv("CINDM_HEARTBEAT", "0")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(heartbeat, "_started", [])
    assert heartbeat.start_heartbeat() is None


def test_singleton_and_prints(monkeypatch, capsys):
    monkeypatch.setenv("CINDM_HEARTBEAT", "1")
    monkeypatch.setattr(heartbeat, "_started", [])
    try:
        t1 = heartbeat.start_heartbeat(period_s=0.05)
        assert isinstance(t1, threading.Thread) and t1.daemon
        t2 = heartbeat.start_heartbeat(period_s=0.05)
        assert t2 is t1  # one thread per process no matter how many CLI mains
        import time

        time.sleep(0.2)
        out = capsys.readouterr().out
        assert "[hb alive" in out
    finally:
        # the daemon must not keep printing into the rest of the session
        heartbeat.stop_heartbeat()
        t1.join(timeout=1.0)
        assert not t1.is_alive()
