"""Inner-loop variants for the banded DCN sampler (r04).

The sampler costs ~6 element-ops per (output el, candidate row): 2
f32-upcast lane gathers + 4 VPU flops. Variants:

  base     current kernel inner loop (per-c (8,128) gathers, f32)
  cbatch   one (cg*8, 128) gather per candidate row (c-planes stacked in
           sublanes, idx broadcast) — fewer op issues
  bf16g    take_along_axis directly on bf16 (does Mosaic lower it now?)

Each variant runs a full-size sampler call at the bench tile geometry so
numbers are comparable to exp_step_breakdown's dcn_sampler_only.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_dcn_inner_r04.py
"""

import functools
import os

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

NG, K, CG = 14 * 16, 9, 16
HP, WP = 64, 128
BAND = 24
DY_LO = -12
HS = HP + BAND
DT = jnp.bfloat16

rng = np.random.default_rng(0)
src = jnp.asarray(rng.standard_normal((NG, CG, HS, WP)), DT)
py = jnp.asarray(
    np.arange(HP, dtype=np.float32)[None, None, :, None]
    + rng.uniform(-8, 8, (NG, K, HP, WP)).astype(np.float32))
px = jnp.asarray(np.clip(
    np.arange(WP, dtype=np.float32)[None, None, None, :]
    + rng.uniform(-8, 8, (NG, K, HP, WP)), 0, 107).astype(np.float32))
mask = jnp.asarray(rng.uniform(0, 1, (NG, K, HP, WP)).astype(np.float32))


def run(name, kern, extra_scratch=()):
    call = pl.pallas_call(
        kern,
        grid=(NG, K),
        in_specs=[
            pl.BlockSpec((1, CG, HS, WP), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, CG, HP, WP),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG, K, CG, HP, WP), DT),
        scratch_shapes=list(extra_scratch),
    )
    try:
        with jax.default_matmul_precision("default"):
            dt = time_stage(jax.jit(lambda *a: call(*a)), src, py, px, mask,
                            iters=4)
        print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED {type(e).__name__}: "
              + " | ".join(str(e).splitlines()[:1]), flush=True)


def base_kernel(src_ref, py_ref, px_ref, m_ref, out_ref, acc_ref):
    pyv = py_ref[0, 0]
    pxv = px_ref[0, 0]
    x0 = jnp.clip(jnp.floor(pxv), 0, WP - 2).astype(jnp.int32)
    x0f = x0.astype(jnp.float32)
    wx0 = jax.nn.relu(1.0 - jnp.abs(pxv - x0f))
    wx1 = jax.nn.relu(1.0 - jnp.abs(pxv - (x0f + 1.0)))
    x1 = x0 + 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (HP, WP), 0).astype(
        jnp.float32)
    m = m_ref[0, 0].astype(DT)
    for c in range(CG):
        acc_ref[c] = jnp.zeros((HP, WP), jnp.float32)
    for bi in range(BAND // 8):
        base = float(DY_LO + bi * 8)
        wps = []
        for r in range(8):
            wy = jax.nn.relu(1.0 - jnp.abs(pyv - (rows + (base + r))))
            wps.append(((wy * wx0), (wy * wx1)))
        for c in range(CG):
            acc = acc_ref[c]
            for r in range(8):
                sm = src_ref[0, c, bi * 8 + r: bi * 8 + r + HP, :].astype(
                    jnp.float32)
                g0 = jnp.take_along_axis(sm, x0, axis=1,
                                         mode="promise_in_bounds")
                g1 = jnp.take_along_axis(sm, x1, axis=1,
                                         mode="promise_in_bounds")
                w0, w1 = wps[r]
                acc = acc + g0 * w0 + g1 * w1
            acc_ref[c] = acc
    for c in range(CG):
        out_ref[0, 0, c] = acc_ref[c].astype(DT) * m


run("base (per-c f32 gathers)", base_kernel,
    [pltpu.VMEM((CG, HP, WP), jnp.float32)])


def bf16_kernel(src_ref, py_ref, px_ref, m_ref, out_ref, acc_ref):
    """gathers stay bf16; weighting in f32 after upcast of gathered."""
    pyv = py_ref[0, 0]
    pxv = px_ref[0, 0]
    x0 = jnp.clip(jnp.floor(pxv), 0, WP - 2).astype(jnp.int32)
    x0f = x0.astype(jnp.float32)
    wx0 = jax.nn.relu(1.0 - jnp.abs(pxv - x0f))
    wx1 = jax.nn.relu(1.0 - jnp.abs(pxv - (x0f + 1.0)))
    x1 = x0 + 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (HP, WP), 0).astype(
        jnp.float32)
    m = m_ref[0, 0].astype(DT)
    for c in range(CG):
        acc_ref[c] = jnp.zeros((HP, WP), jnp.float32)
    for bi in range(BAND // 8):
        base = float(DY_LO + bi * 8)
        wps = []
        for r in range(8):
            wy = jax.nn.relu(1.0 - jnp.abs(pyv - (rows + (base + r))))
            wps.append(((wy * wx0), (wy * wx1)))
        for c in range(CG):
            acc = acc_ref[c]
            for r in range(8):
                sm = src_ref[0, c, bi * 8 + r: bi * 8 + r + HP, :]
                g0 = jnp.take_along_axis(sm, x0, axis=1,
                                         mode="promise_in_bounds")
                g1 = jnp.take_along_axis(sm, x1, axis=1,
                                         mode="promise_in_bounds")
                w0, w1 = wps[r]
                acc = (acc + g0.astype(jnp.float32) * w0
                       + g1.astype(jnp.float32) * w1)
            acc_ref[c] = acc
    for c in range(CG):
        out_ref[0, 0, c] = acc_ref[c].astype(DT) * m


run("bf16 gathers", bf16_kernel, [pltpu.VMEM((CG, HP, WP), jnp.float32)])


def cbatch_kernel(src_ref, py_ref, px_ref, m_ref, out_ref, acc_ref):
    """one (CG*HP, WP) gather per candidate row: c-planes stacked in
    sublanes, idx broadcast across c."""
    pyv = py_ref[0, 0]
    pxv = px_ref[0, 0]
    x0 = jnp.clip(jnp.floor(pxv), 0, WP - 2).astype(jnp.int32)
    x0f = x0.astype(jnp.float32)
    wx0 = jax.nn.relu(1.0 - jnp.abs(pxv - x0f))
    wx1 = jax.nn.relu(1.0 - jnp.abs(pxv - (x0f + 1.0)))
    x1b = jnp.broadcast_to((x0 + 1)[None], (CG, HP, WP)).reshape(
        CG * HP, WP)
    x0b = jnp.broadcast_to(x0[None], (CG, HP, WP)).reshape(CG * HP, WP)
    rows = jax.lax.broadcasted_iota(jnp.int32, (HP, WP), 0).astype(
        jnp.float32)
    m = m_ref[0, 0].astype(DT)
    acc_ref[:] = jnp.zeros((CG, HP, WP), jnp.float32)
    for bi in range(BAND // 8):
        base = float(DY_LO + bi * 8)
        acc = acc_ref[:].reshape(CG * HP, WP)
        for r in range(8):
            wy = jax.nn.relu(1.0 - jnp.abs(pyv - (rows + (base + r))))
            w0 = jnp.broadcast_to((wy * wx0)[None], (CG, HP, WP)).reshape(
                CG * HP, WP)
            w1 = jnp.broadcast_to((wy * wx1)[None], (CG, HP, WP)).reshape(
                CG * HP, WP)
            sm = src_ref[0, :, bi * 8 + r: bi * 8 + r + HP, :].astype(
                jnp.float32).reshape(CG * HP, WP)
            g0 = jnp.take_along_axis(sm, x0b, axis=1,
                                     mode="promise_in_bounds")
            g1 = jnp.take_along_axis(sm, x1b, axis=1,
                                     mode="promise_in_bounds")
            acc = acc + g0 * w0 + g1 * w1
        acc_ref[:] = acc.reshape(CG, HP, WP)
    out_ref[0, 0] = (acc_ref[:] * m[None].astype(jnp.float32)).astype(DT)


run("cbatch (CG*HP,WP) gathers", cbatch_kernel,
    [pltpu.VMEM((CG, HP, WP), jnp.float32)])


def packed_kernel(psrc_ref, py_ref, px_ref, m_ref, out_ref, acc_ref):
    """ONE int32 gather per (c, row): lanes pack (bf16 src[y,x] << 16 |
    bf16 src[y,x+1]); unpack is two bit-ops + bitcasts. Arithmetic is
    bit-identical to `base` (same f32 values, same FMA order)."""
    pyv = py_ref[0, 0]
    pxv = px_ref[0, 0]
    x0 = jnp.clip(jnp.floor(pxv), 0, WP - 2).astype(jnp.int32)
    x0f = x0.astype(jnp.float32)
    wx0 = jax.nn.relu(1.0 - jnp.abs(pxv - x0f))
    wx1 = jax.nn.relu(1.0 - jnp.abs(pxv - (x0f + 1.0)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (HP, WP), 0).astype(
        jnp.float32)
    m = m_ref[0, 0].astype(DT)
    hi_mask = jnp.int32(-65536)
    for c in range(CG):
        acc_ref[c] = jnp.zeros((HP, WP), jnp.float32)
    for bi in range(BAND // 8):
        base = float(DY_LO + bi * 8)
        wps = []
        for r in range(8):
            wy = jax.nn.relu(1.0 - jnp.abs(pyv - (rows + (base + r))))
            wps.append(((wy * wx0), (wy * wx1)))
        for c in range(CG):
            acc = acc_ref[c]
            for r in range(8):
                sm = psrc_ref[0, c, bi * 8 + r: bi * 8 + r + HP, :]
                g = jnp.take_along_axis(sm, x0, axis=1,
                                        mode="promise_in_bounds")
                g0 = jax.lax.bitcast_convert_type(g & hi_mask, jnp.float32)
                g1 = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
                w0, w1 = wps[r]
                acc = acc + g0 * w0 + g1 * w1
            acc_ref[c] = acc
    for c in range(CG):
        out_ref[0, 0, c] = acc_ref[c].astype(DT) * m


def _pack(src_bf16):
    u = jax.lax.bitcast_convert_type(src_bf16, jnp.uint16).astype(jnp.int32)
    nxt = jnp.concatenate([u[..., 1:], jnp.zeros_like(u[..., :1])], -1)
    return (u << 16) | nxt


def run_packed():
    psrc = jax.jit(_pack)(src)
    call = pl.pallas_call(
        packed_kernel,
        grid=(NG, K),
        in_specs=[
            pl.BlockSpec((1, CG, HS, WP), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, CG, HP, WP),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG, K, CG, HP, WP), DT),
        scratch_shapes=[pltpu.VMEM((CG, HP, WP), jnp.float32)],
    )
    try:
        with jax.default_matmul_precision("default"):
            dt = time_stage(jax.jit(lambda *a: call(*a)), psrc, py, px,
                            mask, iters=4)
        print(f"{'packed int32 single-gather':34s} {dt * 1e3:8.2f} ms",
              flush=True)
        # exactness vs base
        base_call = pl.pallas_call(
            base_kernel,
            grid=(NG, K),
            in_specs=[
                pl.BlockSpec((1, CG, HS, WP), lambda i, t: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, HP, WP), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, CG, HP, WP),
                                   lambda i, t: (i, t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NG, K, CG, HP, WP), DT),
            scratch_shapes=[pltpu.VMEM((CG, HP, WP), jnp.float32)],
        )
        with jax.default_matmul_precision("default"):
            a = np.asarray(jax.jit(lambda *x: base_call(*x))(
                src, py, px, mask)[:2])
            b = np.asarray(jax.jit(lambda *x: call(*x))(
                psrc, py, px, mask)[:2])
        print(f"  exact match vs base: {bool((a == b).all())}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{'packed int32 single-gather':34s} FAILED "
              f"{type(e).__name__}: "
              + " | ".join(str(e).splitlines()[:1]), flush=True)


run_packed()
