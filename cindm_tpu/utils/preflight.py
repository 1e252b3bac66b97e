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
import sys
import time
from typing import Optional

RELAY_PORT = 8082


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
