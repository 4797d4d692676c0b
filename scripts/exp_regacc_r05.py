"""A/B the register-accumulation band sweep (E2FGVI_DCN_REGACC) against
the VMEM-scratch sweep on the real chip — head-fused DCN, the bare Pallas
sweep, and a 128-channel banded warp, at serving geometry with smooth
SPyNet-like flows.

The scratch form's fixed traffic (zero-init of the (cg, hp, wp) f32
scratch, a read-modify-write per triggered block, and the final
read-multiply-write pass) is the span-independent floor exp_span_r05
exposed; regacc carries each strip's slab in vregs through lax.cond and
writes the output exactly once.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_regacc_r05.py
"""

import os
import sys

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.kernels import dcn_band as bl  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, H, W, C = 14, 60, 108, 128
G, K = 16, 9
CG = 2 * C // G
DT = jnp.bfloat16
BAND = 24
MAXR = 10.0


def smooth_field(rng, n, h, w, amp, noise=0.25):
    y = np.linspace(0, 2 * np.pi, h)[None, :, None]
    x = np.linspace(0, 2 * np.pi, w)[None, None, :]
    base = np.stack([np.sin(y * 1.1) * np.cos(x * 0.7),
                     np.cos(y * 0.9) * np.sin(x * 1.3)], axis=-1)
    return (amp * base + rng.standard_normal((n, h, w, 2)) * noise
            ).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), DT)
    xw = jnp.asarray(rng.standard_normal((B, H, W, C)), DT)
    head = jnp.asarray(rng.standard_normal((B, H, W, 27 * G)) * 0.1, DT)
    flow = jnp.asarray(smooth_field(rng, B, H, W, 4.0), DT)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 2 * C, C)) * 0.05, DT)
    bias = jnp.zeros((C,), DT)

    outs = {}
    for regacc, blk in ((False, 8), (True, 8), (True, 4), (True, 2)):
        bl.REGACC = regacc
        bl.BLK_ROWS = blk
        tag = f"regacc{blk}" if regacc else "scratch"

        def full(x2, head, flow, wgt, bias):
            return bl.modulated_deform_conv2d_banded_head(
                x2, head, flow, flow, wgt, bias, band=BAND)

        full_j = jax.jit(full)
        outs[tag] = np.asarray(jax.device_get(
            full_j(x2, head, flow, wgt, bias)[0]), np.float32)

        def warp(xw, flow):
            return bl.flow_warp_banded(xw, flow, band=16)

        warp_j = jax.jit(warp)
        warp_j(xw, flow)

        dt = time_stage(full_j, x2, head, flow, wgt, bias, iters=6)
        dw = time_stage(warp_j, xw, flow, iters=6)
        print(f"[{tag:7s}] head-fused dcn {dt * 1e3:8.2f} ms   "
              f"warp128 {dw * 1e3:6.2f} ms", flush=True)

    for tag, out in outs.items():
        if tag == "scratch":
            continue
        diff = np.abs(out - outs["scratch"]).max()
        print(f"max |{tag} - scratch| = {diff:.3e}  "
              f"({'BIT-EXACT' if diff == 0 else 'DIFFERS'})", flush=True)


if __name__ == "__main__":
    main()
