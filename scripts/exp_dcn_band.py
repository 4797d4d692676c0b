"""Measure the banded Pallas DCN sampler on the TPU (round-2 perf spike).

Times kernels/dcn_band.modulated_deform_conv2d_banded against
ops/dcn.modulated_deform_conv2d at the real frame-step shape
(B windows x 16 groups, 9 taps, 60x108, 256ch) and checks agreement for
band-respecting offsets. Run:
  PYTHONPATH=. python scripts/exp_dcn_band.py [band] [batch]
"""

import os
import sys

import numpy as np

from e2fgvi_tpu.utils import env

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
env.setup()

import jax
import jax.numpy as jnp

from e2fgvi_tpu.kernels.dcn_band import modulated_deform_conv2d_banded
from e2fgvi_tpu.ops.dcn import modulated_deform_conv2d
from e2fgvi_tpu.utils.profiling import time_stage

BAND = int(sys.argv[1]) if len(sys.argv) > 1 else 32
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H, W, CIN, G, COUT = 60, 108, 256, 16, 128
K = 9

rng = np.random.default_rng(0)
x = rng.standard_normal((B, H, W, CIN)).astype(np.float32)
offset = (rng.uniform(-1, 1, (B, H, W, G, K, 2)) * (BAND // 2 - 14)
          ).astype(np.float32)
mask = rng.uniform(0, 1, (B, H, W, G, K)).astype(np.float32)
w = (rng.standard_normal((3, 3, CIN, COUT)) * 0.05).astype(np.float32)
bb = rng.standard_normal((COUT,)).astype(np.float32)

for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    jx = jnp.asarray(x, dt)
    jo, jm, jw, jb = map(jnp.asarray, (offset, mask, w.astype(np.float32),
                                       bb))
    jw = jw.astype(dt)
    banded = jax.jit(lambda a, o, m: modulated_deform_conv2d_banded(
        a, o, m, jw, jb, band=BAND))
    ref = jax.jit(lambda a, o, m: modulated_deform_conv2d(a, o, m, jw, jb))
    try:
        t_band = time_stage(banded, jx, jo, jm, iters=8)
        print(f"banded_{tag} band={BAND} B={B}: {t_band*1e3:.2f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).splitlines() if ln][:2]
        print(f"banded_{tag}: FAILED {' | '.join(lines)[:300]}", flush=True)
        continue
    # correctness + XLA-path timing at batch 2 (the f32 XLA gather OOMs
    # standalone at B=8 — it materializes the 2x2 corner blocks)
    got = np.asarray(banded(jx[:2], jo[:2], jm[:2])).astype(np.float32)
    want = np.asarray(ref(jx[:2], jo[:2], jm[:2])).astype(np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    t_ref = time_stage(ref, jx[:2], jo[:2], jm[:2], iters=4)
    print(f"  vs xla_{tag} B=2: banded x{B//2}-> "
          f"{t_band*1e3/ (B//2):.2f} ms-eq, xla {t_ref*1e3:.2f} ms "
          f"({t_ref/(t_band/(B//2)):.1f}x)  rel_err={err:.2e}", flush=True)
