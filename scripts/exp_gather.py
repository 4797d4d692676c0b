"""Experiment: DCN gather formulations on the TPU (round-2 perf spike).

The round-1 DCN (ops/dcn.py) is gather-row-bound: ~933K 2x2-block rows per
frame-step at a measured 34-90M rows/s. This script measures candidate
reformulations at the exact DCN shape (60x108 feature map, 9 taps, 16
deform groups x 8ch = 128 lanes):

  v0_block2x2     round-1 formulation (vmapped per-group 2x2xCg block gather)
  v1_xla_tala     XLA take_along_axis on a (P, 128) row table, per-lane idx
  v2_pallas_tala  same gather inside a Pallas kernel (table VMEM-resident)
  v3_pallas_dcn   fused Pallas bilinear sampler: 4 in-kernel lane-gathers
                  + weights computed in-kernel

Timing: K chained iterations inside one jit (data-dependent index bump) with
a single scalar readback — the axon tunnel adds ~28ms per readback and
block_until_ready does not wait, so per-op timing must be derived this way.

Usage: python scripts/exp_gather.py [v0 v1 v2 v3 ...]  (default: all)
"""

import functools
import sys
import time

import numpy as np

from e2fgvi_tpu.utils import env

env.setup()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 60, 108, 128
P = H * W
KTAPS = 9
N = P * KTAPS          # gather rows per (frame-step, corner) = 58320
ITERS = 20


def report(name, fn, *args, rows_per_call):
    try:
        out = fn(*args)
        val = float(np.asarray(out))
        t0 = time.time()
        out = fn(*args)
        val = float(np.asarray(out))
        dt = (time.time() - t0 - 0.028) / ITERS
        print(f"{name}: {dt*1e3:.3f} ms/call  "
              f"{rows_per_call/dt/1e6:.1f}M rows/s  (check={val:.1f})",
              flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"{name}: FAILED: {type(e).__name__}: {msg}", flush=True)
        return None


# ---------------------------------------------------------------- inputs
rng = np.random.default_rng(0)
tab_np = rng.standard_normal((P, C)).astype(np.float32)
idx_np = rng.integers(0, P, (N, C)).astype(np.int32)
# per-group structure: all 8 lanes of a group share an index (like real DCN)
idx_np = idx_np.reshape(N, 16, 8)[:, :, :1].repeat(8, axis=2).reshape(N, C)
py_np = rng.uniform(0, H - 1, (N, 16)).astype(np.float32)
px_np = rng.uniform(0, W - 1, (N, 16)).astype(np.float32)


def chained_idx(gather_fn, tab, idx):
    """Run gather ITERS times with a data-dependent idx bump."""
    def body(i, carry):
        out = gather_fn(tab, carry)
        bump = (out[:1, :1] > 0).astype(jnp.int32)   # 0/1, data-dependent
        return (carry + bump + 1) % P
    final = lax.fori_loop(0, ITERS, body, idx)
    return jnp.sum(final[0])


# ------------------------------------------------------- v0: round-1 block
def v0():
    from e2fgvi_tpu.ops.dcn import bilinear_block_sample
    tabg = jnp.asarray(tab_np.reshape(P, 16, 8).transpose(1, 0, 2)
                       .reshape(16, H, W, 8))
    py = jnp.asarray(py_np.T.copy())        # (16, N)
    px = jnp.asarray(px_np.T.copy())

    @jax.jit
    def run(tab, py, px):
        def body(i, carry):
            py2, px2, acc = carry
            out = bilinear_block_sample(tab, py2, px2)
            bump = (out[:1, :1, 0] > 0).astype(jnp.float32)
            return (py2 + bump * 1e-3, px2, acc + out[0, 0, 0])
        _, _, acc = lax.fori_loop(0, ITERS, body, (py, px, 0.0))
        return acc
    # rows: one 2x2 block per (row, group)
    report("v0_block2x2 ", run, tabg, py, px, rows_per_call=N * 16)


# ------------------------------------------------- v1: XLA take_along_axis
def v1():
    tab = jnp.asarray(tab_np)
    idx = jnp.asarray(idx_np)

    @jax.jit
    def run(tab, idx):
        return chained_idx(
            lambda t, i: jnp.take_along_axis(t, i, axis=0), tab, idx)
    report("v1_xla_tala ", run, tab, idx, rows_per_call=N)


# -------------------------------------------- v2: Pallas dynamic_gather
# Mosaic's gather lowering (tpu.dynamic_gather) requires
# indices.shape == table.shape: out[i, j] = tab[idx[i, j], j]. One call
# gathers exactly P rows, so the 9 taps run as a grid dimension.
def v2(dtype=jnp.float32, tag="v2_pallas_tala"):
    tab = jnp.asarray(tab_np, dtype)
    idx = jnp.asarray(idx_np).reshape(KTAPS, P, C)

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(
            tab_ref[:], idx_ref[0], axis=0, mode="promise_in_bounds")

    gather = pl.pallas_call(
        kernel,
        grid=(KTAPS,),
        in_specs=[
            pl.BlockSpec((P, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KTAPS, P, C), dtype),
    )

    @jax.jit
    def run(tab, idx):
        def body(i, carry):
            out = gather(tab, carry)
            bump = (out[:1, :1, :1] > 0).astype(jnp.int32)
            return (carry + bump + 1) % P
        final = lax.fori_loop(0, ITERS, body, idx)
        return jnp.sum(final[0, 0])

    # correctness: one call vs numpy
    try:
        got = np.asarray(jax.jit(gather)(tab, idx)).reshape(N, C)
        lanes = np.arange(C)[None, :]
        want = tab_np[idx_np, lanes]
        err = np.abs(got - want).max()
        print(f"{tag} correctness: max_err={err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        lines = str(e).splitlines() or [repr(e)]
        print(f"{tag} correctness FAILED: {type(e).__name__}: "
              f"{lines[0][:300]}", flush=True)
        return
    report(f"{tag}", run, tab, idx, rows_per_call=N)


# --------------------------------------- v3: fused Pallas bilinear sampler
def v3():
    tab = jnp.asarray(tab_np)
    py = jnp.asarray(py_np).reshape(KTAPS, P, 16)
    px = jnp.asarray(px_np).reshape(KTAPS, P, 16)

    def kernel(tab_ref, py_ref, px_ref, out_ref):
        # NOTE pltpu.repeat TILES (concatenates copies): lane j of the
        # repeated position arrays is group j % 16 — the table must use the
        # matching lane layout (lane = ch*16 + group); here the table is
        # random so only the oracle needs to agree.
        pyl = pltpu.repeat(py_ref[0], 8, axis=1)       # (P,128)
        pxl = pltpu.repeat(px_ref[0], 8, axis=1)
        y0 = jnp.clip(jnp.floor(pyl), 0, H - 2).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(pxl), 0, W - 2).astype(jnp.int32)
        wy0 = jax.nn.relu(1.0 - jnp.abs(pyl - y0.astype(jnp.float32)))
        wy1 = jax.nn.relu(1.0 - jnp.abs(pyl - (y0 + 1).astype(jnp.float32)))
        wx0 = jax.nn.relu(1.0 - jnp.abs(pxl - x0.astype(jnp.float32)))
        wx1 = jax.nn.relu(1.0 - jnp.abs(pxl - (x0 + 1).astype(jnp.float32)))
        base = y0 * W + x0
        t = tab_ref[:]

        def g(i):
            return jnp.take_along_axis(t, i, axis=0,
                                       mode="promise_in_bounds")
        out_ref[0] = (g(base) * (wy0 * wx0) + g(base + 1) * (wy0 * wx1)
                      + g(base + W) * (wy1 * wx0)
                      + g(base + W + 1) * (wy1 * wx1))

    sample = pl.pallas_call(
        kernel,
        grid=(KTAPS,),
        in_specs=[
            pl.BlockSpec((P, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KTAPS, P, C), jnp.float32),
    )

    @jax.jit
    def run(tab, py, px):
        def body(i, carry):
            py2, acc = carry
            out = sample(tab, py2, px)
            bump = (out[:1, :1, :1] > 0).astype(jnp.float32)
            return (jnp.minimum(py2 + bump * 1e-3, H - 1.0),
                    acc + out[0, 0, 0])
        _, acc = lax.fori_loop(0, ITERS, body, (py, 0.0))
        return acc

    # correctness vs numpy (one call, sampled readback)
    def np_sample():
        pyl = np.tile(py_np, (1, 8))
        pxl = np.tile(px_np, (1, 8))
        y0 = np.clip(np.floor(pyl), 0, H - 2).astype(np.int64)
        x0 = np.clip(np.floor(pxl), 0, W - 2).astype(np.int64)
        wy0 = np.maximum(1 - np.abs(pyl - y0), 0)
        wy1 = np.maximum(1 - np.abs(pyl - y0 - 1), 0)
        wx0 = np.maximum(1 - np.abs(pxl - x0), 0)
        wx1 = np.maximum(1 - np.abs(pxl - x0 - 1), 0)
        lanes = np.arange(C)[None, :]
        t = tab_np
        return (t[(y0 * W + x0), lanes] * wy0 * wx0
                + t[(y0 * W + x0 + 1), lanes] * wy0 * wx1
                + t[((y0 + 1) * W + x0), lanes] * wy1 * wx0
                + t[((y0 + 1) * W + x0 + 1), lanes] * wy1 * wx1)

    try:
        got = np.asarray(jax.jit(sample)(tab, py, px)).reshape(N, C)[::997]
        want = np_sample()[::997]
        err = np.abs(got - want).max()
        print(f"v3 correctness: max_err={err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        lines = str(e).splitlines() or [repr(e)]
        print(f"v3 correctness: FAILED {type(e).__name__}: "
              f"{lines[0][:300]}", flush=True)
        return
    report("v3_pallas_dcn", run, tab, py, px, rows_per_call=N)


VARIANTS = {
    "v0": v0,
    "v1": v1,
    "v2": v2,
    "v2b": functools.partial(v2, dtype=jnp.bfloat16, tag="v2_pallas_bf16"),
    "v3": v3,
}

if __name__ == "__main__":
    import contextlib
    import os
    which = sys.argv[1:] or list(VARIANTS)
    print(f"device: {jax.devices()[0].platform}", flush=True)
    ctx = (pltpu.force_tpu_interpret_mode()
           if os.environ.get("E2FGVI_INTERP") else contextlib.nullcontext())
    with ctx:
        for name in which:
            VARIANTS[name]()
