"""Unit tests for the TPU-relay preflight probe (`utils/preflight.py`)."""

import socket

import pytest

from cindm_tpu.utils import preflight


def test_noop_when_not_axon(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert preflight.require_tpu_reachable(attempts=1, wait_s=0.0)


def test_listening_relay_passes(monkeypatch):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    try:
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setattr(preflight, "RELAY_PORT", port)
        assert preflight.require_tpu_reachable(attempts=1, wait_s=0.0)
    finally:
        srv.close()


def _closed_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()  # nothing listens here anymore
    return port


def test_dead_relay_warns_by_default(monkeypatch, capsys):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("CINDM_REQUIRE_TPU", raising=False)
    monkeypatch.setattr(preflight, "RELAY_PORT", _closed_port())
    assert not preflight.require_tpu_reachable(attempts=2, wait_s=0.0)
    assert "tunnel is down" in capsys.readouterr().err


def test_dead_relay_hard_fails_when_required(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("CINDM_REQUIRE_TPU", "1")
    monkeypatch.setattr(preflight, "RELAY_PORT", _closed_port())
    with pytest.raises(SystemExit, match="relay not listening"):
        preflight.require_tpu_reachable(attempts=1, wait_s=0.0)


# --- responsiveness probe (wedged-tunnel mode: port listens, ops hang) ---


def test_responsive_noop_when_not_axon(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert preflight.require_tpu_responsive(attempts=1, wait_s=0.0)


def test_op_probe_success_and_timeout(monkeypatch):
    # fast-exiting probe -> True; sleeping probe + tiny timeout -> False
    monkeypatch.setattr(preflight, "_PROBE_CODE", "pass")
    assert preflight.tpu_op_succeeds(timeout_s=30.0)
    monkeypatch.setattr(preflight, "_PROBE_CODE", "import time; time.sleep(30)")
    assert not preflight.tpu_op_succeeds(timeout_s=0.5)


def test_wedged_tunnel_detected(monkeypatch, capsys):
    """Port listens but the device op never completes: warn-mode returns
    False, require-mode raises — the round-5 wedge mode bench.py guards."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    try:
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.delenv("CINDM_REQUIRE_TPU", raising=False)
        monkeypatch.setattr(preflight, "RELAY_PORT", srv.getsockname()[1])
        monkeypatch.setattr(preflight, "tpu_op_succeeds", lambda **kw: False)
        assert not preflight.require_tpu_responsive(attempts=1, wait_s=0.0)
        assert "wedged tunnel" in capsys.readouterr().err
        monkeypatch.setenv("CINDM_REQUIRE_TPU", "1")
        with pytest.raises(SystemExit, match="wedged tunnel"):
            preflight.require_tpu_responsive(attempts=1, wait_s=0.0)
    finally:
        srv.close()


def test_responsive_passes_on_healthy_tunnel(monkeypatch):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    try:
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setattr(preflight, "RELAY_PORT", srv.getsockname()[1])
        monkeypatch.setattr(preflight, "tpu_op_succeeds", lambda **kw: True)
        assert preflight.require_tpu_responsive(attempts=1, wait_s=0.0)
    finally:
        srv.close()
