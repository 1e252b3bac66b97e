"""Log-liveness heartbeat for long silent device operations.

The axon tunnel infra runs every chip job under a log-silence watchdog
(`scripts_paper/round5_queue2.sh` wd: jobs are killed after 900 s without
output once they have printed anything). Two legitimate phases are silent
for longer than that: cold remote compiles (10-15 min observed, RESULTS.md
round 5) and single-call closed-loop BDIM evaluation
(`utils/eval2d.py:evaluate_designs` — one device call simulating every
valid design, ~10 min at batch 16). Round 4's CEM nb=2 baseline row died
twice to exactly this interaction.

``start_heartbeat`` runs a daemon thread that prints an elapsed-time line
every ``period_s``; the GIL is released during XLA compile RPCs and device
execution, so the thread keeps printing while the main thread blocks. It is
a no-op off the axon platform (tests, CPU runs) unless CINDM_HEARTBEAT=1
forces it on.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional


_started: list = []
_stop = threading.Event()


def start_heartbeat(period_s: float = 240.0, tag: str = "hb") -> Optional[threading.Thread]:
    if _started:  # singleton: CLIs re-entered in-process (run_tables_paper)
        return _started[0]
    forced = os.environ.get("CINDM_HEARTBEAT")
    if forced == "0":
        return None
    if forced != "1" and "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return None
    _stop.clear()
    t0 = time.time()

    def run():
        while not _stop.wait(period_s):
            # leading '[' keeps these lines invisible to the queue's
            # last-JSON-line extractor (rec() greps '^{')
            print(f"[{tag} alive {time.time() - t0:.0f}s]", flush=True)

    th = threading.Thread(target=run, daemon=True, name="cindm-heartbeat")
    th.start()
    _started.append(th)
    return th


def stop_heartbeat() -> None:
    """Stop the singleton thread (tests; CLIs just exit — it's a daemon)."""
    _stop.set()
    _started.clear()
