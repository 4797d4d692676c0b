"""Gather-layout construction variants for the fused attention path.

r04 first cut: separate k/v takes measured 12.3 ms/block net of qkv
(write floor ~2.1 ms). Variants here:
  A  separate k/v takes (baseline)
  B  one take over k||v concatenated on hd (256-el rows)
  C  one take over the raw (t, hw, 3*heads*hd) qkv GEMM output
     (1536-el rows, q gathered too = +50% bytes but zero relayout)
  D  B with per-window-sorted indices (locality)

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_gather_r04.py
"""

import os

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.models import tfocal  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, T, HH, WW, C = 14, 17, 20, 36, 512
HEADS = 4
HD = C // HEADS
WIN = (5, 9)
EXP = (2, 4)
DT = jnp.bfloat16

rng = np.random.default_rng(0)
wh, ww = WIN
nwy, nwx = HH // wh, WW // ww
NWH, NWW = nwy, nwx
pk = (5, 9)
pp = (2, 4)
idx, n_fine = tfocal._key_gather_idx(
    HH, WW, wh, ww, *EXP, (NWH, NWW, pk[0], pk[1], pp[0], pp[1]))
NWIN, S = idx.shape
S_PAD = -(-S // 16) * 16
NSRC = HH * WW + NWH * NWW + 1
ZERO = NSRC - 1
idx_pad = np.full((NWIN, S_PAD), ZERO, np.int32)
idx_pad[:, :S] = idx
idx_flat = jnp.asarray(idx_pad.reshape(-1))
idx_sorted = jnp.asarray(np.sort(idx_pad, axis=1).reshape(-1))

k_src = jnp.asarray(rng.standard_normal((B * HEADS, T, NSRC, HD)), DT)
v_src = jnp.asarray(rng.standard_normal((B * HEADS, T, NSRC, HD)), DT)
qkv_src = jnp.asarray(rng.standard_normal((B, T, NSRC, 3 * C)), DT)


def t(name, fn, *args):
    try:
        dt = time_stage(jax.jit(fn), *args, iters=6)
        print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s} FAILED {type(e).__name__}: "
              + " | ".join(str(e).splitlines()[:1]), flush=True)
        return None


def var_a(k, v):
    gk = jnp.take(k, idx_flat, axis=2)
    gv = jnp.take(v, idx_flat, axis=2)
    return gk.reshape(B * HEADS, T, NWIN, S_PAD, HD), \
        gv.reshape(B * HEADS, T, NWIN, S_PAD, HD)


def var_b(k, v):
    kv = jnp.concatenate([k, v], axis=-1)
    g = jnp.take(kv, idx_flat, axis=2)
    g = g.reshape(B * HEADS, T, NWIN, S_PAD, 2 * HD)
    return g[..., :HD], g[..., HD:]


def var_c(qkv):
    g = jnp.take(qkv, idx_flat, axis=2)
    return g.reshape(B, T, NWIN, S_PAD, 3 * C)


def var_d(k, v):
    kv = jnp.concatenate([k, v], axis=-1)
    g = jnp.take(kv, idx_sorted, axis=2)
    g = g.reshape(B * HEADS, T, NWIN, S_PAD, 2 * HD)
    return g[..., :HD], g[..., HD:]


t("A separate k/v takes", var_a, k_src, v_src)
t("B combined kv take (256 rows)", var_b, k_src, v_src)
t("C raw-qkv take (1536 rows)", var_c, qkv_src)
t("D combined kv, sorted idx", var_d, k_src, v_src)

# E: dynamic-slice loop over windows from the wrap-padded map — how does
# a pure slice-stack into the (T, nwin, S_pad) layout compare?
kf = jnp.asarray(rng.standard_normal(
    (B * HEADS, T, HH + 2 * EXP[0], WW + 2 * EXP[1], HD)), DT)


def var_e(zf, zp):
    rects = tfocal._rolled_rects(wh, ww, *EXP)
    outs = []
    for wy in range(nwy):
        for wx in range(nwx):
            parts = [zf[:, :, wy * wh + EXP[0]: wy * wh + EXP[0] + wh,
                        wx * ww + EXP[1]: wx * ww + EXP[1] + ww]]
            for (sy, sx, y0, y1, x0, x1) in rects:
                ry = wy * wh + y0 - sy + EXP[0]
                rx = wx * ww + x0 - sx + EXP[1]
                parts.append(zf[:, :, ry: ry + (y1 - y0),
                                rx: rx + (x1 - x0)])
            parts = [p.reshape(B * HEADS, T, -1, HD) for p in parts]
            parts.append(zp[:, :, wy * nwx + wx])
            w = jnp.concatenate(parts, axis=2)
            outs.append(jnp.pad(w, ((0, 0), (0, 0), (0, S_PAD - S),
                                    (0, 0))))
    return jnp.stack(outs, axis=2)


zp = jnp.asarray(rng.standard_normal((B * HEADS, T, NWIN, pk[0] * pk[1],
                                      HD)), DT)
t("E slice-stack into gather layout", var_e, kf, zp)
