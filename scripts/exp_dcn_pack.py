"""Channel-packed banded DCN sampler spike.

The banded sampler's cost is dominated by lane-dim dynamic gathers (2 per
(channel, band-row)). bf16 is truncated f32, so TWO bf16 channels packed
into one u32 lane are gathered by ONE 32-bit gather and unpacked with a
shift + bitcast: lo = bitcast_f32(g << 16), hi = bitcast_f32(g &
0xFFFF0000). Halves the gather count; exact.

Times packed vs current at the frame-step shape. Run:
  PYTHONPATH=.:/root/.axon_site python scripts/exp_dcn_pack.py [band] [B]
"""

import functools
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

from e2fgvi_tpu.kernels import dcn_band
from e2fgvi_tpu.utils.profiling import time_stage

BAND = int(sys.argv[1]) if len(sys.argv) > 1 else 48
B = int(sys.argv[2]) if len(sys.argv) > 2 else 14
H, W, CIN, G = 60, 108, 256, 16
K = 9
CG = CIN // G


def _packed_kernel(src_ref, py_ref, px_ref, m_ref, out_ref, *, band, cgp,
                   hp, wp, dy_lo):
    py = py_ref[0, 0]
    px = px_ref[0, 0]
    x0 = jnp.clip(jnp.floor(px), 0, wp - 2).astype(jnp.int32)
    x0f = x0.astype(jnp.float32)
    wx0 = jax.nn.relu(1.0 - jnp.abs(px - x0f))
    wx1 = jax.nn.relu(1.0 - jnp.abs(px - (x0f + 1.0)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(
        jnp.float32)
    x1 = x0 + 1
    m = m_ref[0, 0].astype(jnp.bfloat16)

    def unpack(g):
        lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(g & jnp.uint32(0xFFFF0000),
                                          jnp.float32)
        return lo, hi

    def blk_step(bi, accs):
        dif0 = (bi * 8).astype(jnp.float32)
        wps = []
        for r in range(8):
            wy = jax.nn.relu(
                1.0 - jnp.abs(py - (rows + (dy_lo + r) + dif0)))
            wps.append((wy * wx0, wy * wx1))
        new = []
        for c in range(cgp):
            s_blk = src_ref[0, c,
                            pl.ds(pl.multiple_of(bi * 8, 8), hp + 8), :]
            acc_lo, acc_hi = accs[2 * c], accs[2 * c + 1]
            for r in range(8):
                s = s_blk[r: r + hp]
                g0 = jnp.take_along_axis(s, x0, axis=1,
                                         mode="promise_in_bounds")
                g1 = jnp.take_along_axis(s, x1, axis=1,
                                         mode="promise_in_bounds")
                w0, w1 = wps[r]
                g0l, g0h = unpack(g0)
                g1l, g1h = unpack(g1)
                acc_lo = acc_lo + g0l * w0 + g1l * w1
                acc_hi = acc_hi + g0h * w0 + g1h * w1
            new.extend([acc_lo, acc_hi])
        return tuple(new)

    accs = jax.lax.fori_loop(
        0, band // 8, blk_step,
        tuple(jnp.zeros((hp, wp), jnp.float32) for _ in range(2 * cgp)))
    for c in range(2 * cgp):
        out_ref[0, 0, c] = accs[c].astype(jnp.bfloat16) * m


@functools.lru_cache(maxsize=None)
def _build_packed(ng, k, cgp, hp, wp, band, dy_lo):
    hs = hp + band
    kern = functools.partial(_packed_kernel, band=band, cgp=cgp, hp=hp,
                             wp=wp, dy_lo=dy_lo)
    return pl.pallas_call(
        kern,
        grid=(ng, k),
        in_specs=[
            pl.BlockSpec((1, cgp, hs, wp), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2 * cgp, hp, wp),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, k, 2 * cgp, hp, wp),
                                       jnp.bfloat16),
    )


def main():
    rng = np.random.default_rng(0)
    n, g, cg = B, G, CG
    ng = n * g
    ho = wo = None
    h, wdt = H, W
    hp = -(-h // 8) * 8
    wp = 128
    dy_lo = -(BAND // 2)
    hs = hp + BAND

    src = rng.standard_normal((ng, cg, hs, wp)).astype(np.float32)
    src_bf = jnp.asarray(src, jnp.bfloat16)
    rowsv = np.arange(hp, dtype=np.float32)[None, None, :, None]
    py = (rowsv + rng.uniform(dy_lo + 1, BAND + dy_lo - 2,
                              (ng, K, hp, wp))).astype(np.float32)
    px = rng.uniform(0, wdt, (ng, K, hp, wp)).astype(np.float32)
    msk = rng.uniform(0, 1, (ng, K, hp, wp)).astype(np.float32)
    jpy, jpx, jm = map(jnp.asarray, (py, px, msk))

    # current kernel
    cur = dcn_band._build_sampler(ng, K, cg, hp, wp, BAND, dy_lo,
                                  "bfloat16", False)
    t_cur = time_stage(jax.jit(cur), src_bf, jpy, jpx, jm, iters=6)
    print(f"current band={BAND} B={B}: {t_cur*1e3:.2f} ms/step",
          flush=True)

    # packed: (ng, cg, hs, wp) bf16 -> (ng, cg/2, hs, wp) u32
    u16 = jax.lax.bitcast_convert_type(src_bf, jnp.uint16).astype(
        jnp.uint32)
    packed = (u16[:, 0::2] | (u16[:, 1::2] << 16))
    pk = _build_packed(ng, K, cg // 2, hp, wp, BAND, dy_lo)
    try:
        t_pk = time_stage(jax.jit(pk), packed, jpy, jpx, jm, iters=6)
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).splitlines() if ln][:3]
        print("packed FAILED: " + " | ".join(lines)[:400], flush=True)
        return
    print(f"packed  band={BAND} B={B}: {t_pk*1e3:.2f} ms/step "
          f"({t_cur/t_pk:.2f}x)", flush=True)

    got = np.asarray(pk(packed, jpy, jpx, jm)).astype(np.float32)
    want = np.asarray(cur(src_bf, jpy, jpx, jm)).astype(np.float32)
    err = np.abs(got - want).max()
    print(f"max_abs_err vs current: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
