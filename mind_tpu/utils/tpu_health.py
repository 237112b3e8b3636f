"""The one TPU health probe every hardware-evidence gate shares.

The axon-tunneled chip needs a LONG fully-idle recovery after a worker
fault; clients started during recovery hang in backend init, and repeated
probing appears to RESET the recovery window (measured behavior recorded in
.claude/skills/verify/SKILL.md). Every prober therefore must (a) run the
probe in a killable subprocess, and (b) space probes >= 20 minutes apart.
This module owns (a) so the probe itself cannot drift between callers
(bench.py's gate and scripts/run_evidence.py); each caller owns its own
spacing policy, documented at its sleep site.
"""

from __future__ import annotations

import subprocess
import sys

PROBE_TIMEOUT_S = 180

_PROBE_CODE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((128,128), jnp.bfloat16); "
    "print('PROBE_OK', float((x@x).sum()))"
)


def probe_once(timeout_s: float = PROBE_TIMEOUT_S) -> bool:
    """One trivial-matmul device probe in a fresh subprocess.

    Returns True iff the probe completed within `timeout_s`. A hang (backend
    init stuck in the fault-recovery window) is killed by the timeout and
    reported as unhealthy.
    """
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                           stdout=subprocess.PIPE,
                           stderr=subprocess.DEVNULL, timeout=timeout_s)
        return b"PROBE_OK" in p.stdout
    except subprocess.TimeoutExpired:
        return False
