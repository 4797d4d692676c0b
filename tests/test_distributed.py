"""Two-process distributed smoke test (reference surface: core/dist.py,
train.py:29-35 — multi-node rendezvous + DDP gradient all-reduce).

Spawns 2 CPU processes with a local coordinator; each discovers the world
from the E2FGVI_* env vars, joins via `initialize_distributed`, assembles
its half of the global batch with `global_batch_array`, and runs ONE GAN
train step over the 2-process mesh. The step's losses and updated-param
checksum must match the SAME step run single-process — which is exactly
the reference's DDP contract (gradients averaged across ranks give every
rank identical updates).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "dist_worker.py")


def _run(nprocs, port, outdir):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("E2FGVI_", "XLA_", "JAX_"))}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(r), str(nprocs), str(port),
         str(outdir)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for r in range(nprocs)]
    outs = [p.communicate(timeout=1500)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    with open(os.path.join(outdir, f"logs_{nprocs}proc.json")) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_train_step_matches_single(tmp_path):
    two = _run(2, 23477, tmp_path)
    one = _run(1, 23478, tmp_path)
    assert set(two) == set(one)
    for k in one:
        np.testing.assert_allclose(two[k], one[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
