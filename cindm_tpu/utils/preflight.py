"""Fail-fast TPU reachability check for the tunneled (axon) backend.

On this infra the TPU is reached through a local TCP relay
(127.0.0.1:8082...). If the relay process dies, the PJRT plugin's first
device call blocks forever in a connect-retry loop — a process with ~zero
CPU, no log output, and no error (observed: two 25-minute design runs
burned to step timeouts with nothing written). A 2-second socket probe
before the first device touch turns that failure mode into an instant,
diagnosable error.

Only active when JAX_PLATFORMS requests the axon platform; no-op on CPU
runs and standard TPU runtimes. Warn-only by default so an incidental
probe failure can never kill a run that would have worked (the driver's
bench must survive); queue scripts set CINDM_REQUIRE_TPU=1 to hard-fail.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
from typing import Optional

RELAY_PORT = 8082

# Tiny device op for the responsiveness probe: one 128x128 matmul, enough to
# force a real compile+execute round-trip through the relay without costing
# meaningful chip time on a healthy tunnel.
_PROBE_CODE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((128, 128)); (x @ x).block_until_ready()"
)


def axon_relay_listening(port: Optional[int] = None, timeout: float = 2.0) -> bool:
    # read RELAY_PORT at call time (a def-time default would freeze it)
    port = RELAY_PORT if port is None else port
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.settimeout(timeout)
    try:
        s.connect(("127.0.0.1", port))
        return True
    except OSError:
        return False
    finally:
        s.close()


def require_tpu_reachable(attempts: int = 3, wait_s: float = 3.0) -> bool:
    """Probe the relay before the first jax device call. Returns True when
    reachable or not applicable; warns (or raises with CINDM_REQUIRE_TPU=1)
    when the axon relay is down."""
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True
    for i in range(attempts):
        if axon_relay_listening():
            return True
        if i + 1 < attempts:
            time.sleep(wait_s)
    msg = (
        f"axon relay not listening on 127.0.0.1:{RELAY_PORT} — the TPU "
        "tunnel is down; a jax device call would hang forever in the "
        "plugin's connect-retry loop"
    )
    if os.environ.get("CINDM_REQUIRE_TPU") == "1":
        raise SystemExit(f"FATAL: {msg}")
    print(f"WARNING: {msg}", file=sys.stderr, flush=True)
    return False


def tpu_op_succeeds(timeout_s: float = 150.0) -> bool:
    """Run one tiny device op in a FRESH subprocess under a hard timeout.

    The second observed wedge mode (2026-08, three sessions) passes the
    socket probe — the relay port still accepts TCP — but the first device
    op hangs forever (log-silent, CPU frozen after client init). A hung op
    in-process is unrecoverable, so the probe must be a subprocess we can
    kill. The timeout covers a cold remote compile of the 128x128 matmul
    (~10-40 s healthy; wedged processes never return).
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            env=os.environ.copy(),
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def require_tpu_responsive(
    attempts: int = 2, op_timeout_s: float = 150.0, wait_s: float = 10.0
) -> bool:
    """Strong preflight: relay port listening AND a device op completes.

    Catches both wedge modes — dead relay (connect fails) and wedged tunnel
    (port listens, ops hang). Same warn/hard-fail contract as
    ``require_tpu_reachable``; no-op off the axon platform. Costs one small
    subprocess op per call on a healthy tunnel (~10-40 s with a cold server
    compile cache), so callers gate it to once per process, not per step.
    """
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True
    if not require_tpu_reachable(attempts=attempts, wait_s=wait_s):
        return False
    for i in range(attempts):
        if tpu_op_succeeds(timeout_s=op_timeout_s):
            return True
        if i + 1 < attempts:
            time.sleep(wait_s)
    msg = (
        "axon relay accepts TCP but a device op did not complete within "
        f"{op_timeout_s:.0f}s — wedged tunnel (round-5 failure mode); a jax "
        "device call in this process would hang forever"
    )
    if os.environ.get("CINDM_REQUIRE_TPU") == "1":
        raise SystemExit(f"FATAL: {msg}")
    print(f"WARNING: {msg}", file=sys.stderr, flush=True)
    return False
