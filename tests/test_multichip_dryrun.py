"""Timed smoke of the driver's multi-chip gate (VERDICT r04 #1).

Runs `__graft_entry__.dryrun_multichip(8)` exactly the way the driver
does — a fresh subprocess with XLA_FLAGS forcing 8 virtual CPU devices
and a COLD compilation cache — and pins the wall time. The r04 gate
regressed to a timeout (rc=124) because the step's execution (not
compile) grew past the budget on this 1-core box; this test fails before
the driver does if that ever happens again.

Budget: the r05 configuration measures ~285 s cold on an idle box
(import 2 + setup 35 + lower 7 + compile 56 + exec 185, /tmp/dr_sweep
methodology). The bound below leaves ~1.7x headroom for box contention
while staying under the driver's observed kill threshold (>560 s).
"""

import os
import subprocess
import sys
import tempfile
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRYRUN_BUDGET_S = 480


@pytest.mark.slow
def test_dryrun_multichip_under_budget():
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8)")
    env = dict(os.environ)
    with tempfile.TemporaryDirectory() as cache:
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
            "JAX_PLATFORMS": "cpu",
            # cold cache: the driver's box gives no warm-cache guarantee
            "E2FGVI_JAX_CACHE": cache,
            "PYTHONPATH": REPO,
        })
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=DRYRUN_BUDGET_S)
        wall = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout
    assert wall < DRYRUN_BUDGET_S, (
        f"dryrun took {wall:.0f}s — over the {DRYRUN_BUDGET_S}s budget; "
        "the driver gate (MULTICHIP_r*.json) will time out")
