"""Prototype: banded Pallas DCN sampler (round-2 perf spike).

Design: Mosaic's lane-dim dynamic_gather (out[i,j] = tab[i, idx[i,j]])
compiles on this toolchain (multi-vreg SUBLANE gathers do not). So:
- x-sampling is exact for arbitrary offsets: one lane-gather per corner,
- y-sampling sweeps a static band of row shifts dy with bilinear weights
  relu(1 - |py - (row+dy)|) (zero outside the band, zero-padded rows give
  mmcv's zeros-outside semantics exactly).

The kernel is EXACT whenever every sample's floor(py) falls within
[row+dy_lo, row+dy_hi - 1]; the caller picks the band per video from the
measured flow range and falls back to the XLA gather path beyond it.

Measures ms/call at the real DCN shape (B=8 windows x 16 deform groups,
9 taps, 16ch/group, 60x108 -> 64x128 padded) and checks exactness vs a
numpy oracle. Run: PYTHONPATH=. python scripts/exp_dcn_band.py [band]
"""

import os
import sys

import numpy as np

from e2fgvi_tpu.utils import env

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
env.setup()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2fgvi_tpu.utils.profiling import time_stage

B, G, K, CG = 8, 16, 9, 16
H, W = 60, 108
HP, WP = 64, 128          # padded output tile
BAND = int(sys.argv[1]) if len(sys.argv) > 1 else 24
DY_LO = -(BAND // 2)
HS = HP + BAND            # padded source rows
BG = B * G


def make_kernel(dtype):
    def kernel(src_ref, py_ref, px_ref, m_ref, out_ref):
        py = py_ref[0]                                  # (HP, WP) f32
        px = px_ref[0]
        x0 = jnp.clip(jnp.floor(px), 0, WP - 2).astype(jnp.int32)
        x0f = x0.astype(jnp.float32)
        wx0 = jax.nn.relu(1.0 - jnp.abs(px - x0f))
        wx1 = jax.nn.relu(1.0 - jnp.abs(px - (x0f + 1.0)))
        rows = jax.lax.broadcasted_iota(jnp.float32, (HP, WP), 0)
        w_pairs = []
        for di in range(BAND):
            wy = jax.nn.relu(1.0 - jnp.abs(py - (rows + (DY_LO + di))))
            w_pairs.append(((wy * wx0).astype(dtype),
                            (wy * wx1).astype(dtype)))
        x1 = x0 + 1
        m = m_ref[0].astype(dtype)
        for c in range(CG):
            acc = jnp.zeros((HP, WP), dtype)
            for di in range(BAND):
                s = src_ref[c, di:di + HP, :]
                g0 = jnp.take_along_axis(s, x0, axis=1,
                                         mode="promise_in_bounds")
                g1 = jnp.take_along_axis(s, x1, axis=1,
                                         mode="promise_in_bounds")
                w0, w1 = w_pairs[di]
                acc = acc + g0 * w0 + g1 * w1
            out_ref[0, c] = acc * m

    return kernel


def build(dtype):
    return pl.pallas_call(
        make_kernel(dtype),
        grid=(BG, K),
        in_specs=[
            pl.BlockSpec((1, CG, HS, WP), lambda i, k: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, CG, HP, WP),
                               lambda i, k: (i, k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BG, K, CG, HP, WP), dtype),
    )


def oracle(src, py, px, m):
    """numpy bilinear sample with zeros-outside, per (bg, k)."""
    out = np.zeros((BG, K, CG, HP, WP), np.float32)
    srcp = src  # (BG, CG, HS, WP); rows [BAND//2, BAND//2+H) are real
    for bg in range(BG):
        for k in range(K):
            x0 = np.clip(np.floor(px[bg, k]), 0, WP - 2).astype(int)
            wx0 = np.maximum(1 - np.abs(px[bg, k] - x0), 0)
            wx1 = np.maximum(1 - np.abs(px[bg, k] - (x0 + 1)), 0)
            acc = np.zeros((CG, HP, WP), np.float32)
            rows = np.arange(HP)[:, None]
            for di in range(BAND):
                wy = np.maximum(
                    1 - np.abs(py[bg, k] - (rows + (DY_LO + di))), 0)
                s = srcp[bg, :, di:di + HP, :]
                g0 = np.take_along_axis(
                    s, x0[None].repeat(CG, 0), axis=2)
                g1 = np.take_along_axis(
                    s, (x0 + 1)[None].repeat(CG, 0), axis=2)
                acc += g0 * (wy * wx0) + g1 * (wy * wx1)
            out[bg, k] = acc * m[bg, k]
    return out


rng = np.random.default_rng(0)
src = np.zeros((BG, CG, HS, WP), np.float32)
src[:, :, -DY_LO:-DY_LO + H, :W] = rng.standard_normal((BG, CG, H, W))
rows = np.arange(HP, dtype=np.float32)[None, None, :, None]
py = (rows + rng.uniform(DY_LO + 0.01, BAND + DY_LO - 1.01,
                         (BG, K, HP, WP))).astype(np.float32)
# py is the position in PADDED row coords == real row + (-DY_LO)?? no:
# src row r of the padded array holds real row r + DY_LO relative to ...
# positions here are directly in "output row + dy" space, consistent
# between kernel and oracle, so exactness is what we're testing.
px = rng.uniform(-2, W + 2, (BG, K, HP, WP)).astype(np.float32)
m = rng.uniform(0, 1, (BG, K, HP, WP)).astype(np.float32)

for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    fn = build(dtype)
    jsrc = jnp.asarray(src, dtype)
    jpy, jpx, jm = map(jnp.asarray, (py, px, m))
    try:
        got = np.asarray(jax.jit(fn)(jsrc, jpy, jpx, jm)).astype(np.float32)
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).splitlines() if ln][:2]
        print(f"band_{tag}: FAILED {' | '.join(lines)[:300]}", flush=True)
        continue
    want = oracle(src.astype(np.float32) if tag == "f32"
                  else np.asarray(jsrc).astype(np.float32), py, px, m)
    err = np.abs(got - want).max()
    rel = err / max(np.abs(want).max(), 1e-9)
    dt = time_stage(jax.jit(fn), jsrc, jpy, jpx, jm, iters=8)
    print(f"band_{tag} (band={BAND}): {dt*1e3:.2f} ms/step-call  "
          f"max_abs_err={err:.3e} rel={rel:.3e}", flush=True)
