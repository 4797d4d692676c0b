"""Probe the axon TPU tunnel before committing to a real-device run.

The tunnel fails in two distinct modes (both observed in round 5):
  1. `import jax` itself blocks inside the PJRT plugin hook (>280 s) while
     the relay is half-dead — no Python code after the import ever runs.
  2. Devices enumerate fine but a small device_put+fence stalls (>230 s).

This script covers both by doing ALL jax work in a subprocess with a hard
deadline, so the caller can never hang. Exit code 0 = tunnel usable,
2 = dead/stalled. Prints one JSON line with stage timings.

Usage:  python scripts/probe_tpu.py [--budget 120]
"""

import argparse
import json
import subprocess
import sys
import time

_CHILD = r"""
import time, numpy as np
t0 = time.time()
import jax
print("stage import %.1f" % (time.time() - t0), flush=True)
t0 = time.time()
d = jax.devices()
print("stage devices %.1f %s" % (time.time() - t0, d[0].platform), flush=True)
t0 = time.time()
x = jax.device_put(np.ones((1024, 1024), np.float32))
x.block_until_ready()
print("stage put %.1f" % (time.time() - t0), flush=True)
t0 = time.time()
y = jax.jit(lambda a: a @ a)(x)
# axon's block_until_ready does not fence execution: force a readback
s = float(np.asarray(y[:1, :1]))
print("stage matmul %.1f %.0f" % (time.time() - t0, s), flush=True)
t0 = time.time()
z = np.asarray(y)
print("stage pull %.1f mbps %.1f"
      % (time.time() - t0, 4.0 / max(time.time() - t0, 1e-9)), flush=True)
"""


def probe(budget: float) -> dict:
    t0 = time.time()
    p = subprocess.Popen([sys.executable, "-u", "-c", _CHILD],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    stages = {}
    try:
        out, _ = p.communicate(timeout=budget)
        for line in out.splitlines():
            parts = line.split()
            if parts[:1] == ["stage"]:
                stages[parts[1]] = float(parts[2])
        ok = p.returncode == 0 and "pull" in stages
    except subprocess.TimeoutExpired:
        p.kill()
        p.wait()
        ok = False
    return {"ok": ok, "stages": stages,
            "wall_s": round(time.time() - t0, 1)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=120.0,
                    help="hard deadline for the whole probe (s)")
    args = ap.parse_args()
    r = probe(args.budget)
    print(json.dumps(r), flush=True)
    sys.exit(0 if r["ok"] else 2)
