"""Gather variant F: 4.3KB rows ((t, hd) minor) vs A's 256B rows.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_gather2_r04.py
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
pk, pp = (5, 9), (2, 4)
idx, n_fine = tfocal._key_gather_idx(
    HH, WW, wh, ww, *EXP, (nwy, nwx, pk[0], pk[1], pp[0], pp[1]))
NWIN, S = idx.shape
S_PAD = -(-S // 16) * 16
NSRC = HH * WW + nwy * nwx + 1
ZERO = NSRC - 1
idx_pad = np.full((NWIN, S_PAD), ZERO, np.int32)
idx_pad[:, :S] = idx
idx_flat = jnp.asarray(idx_pad.reshape(-1))


def t(name, fn, *args):
    try:
        dt = time_stage(jax.jit(fn), *args, iters=6)
        print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s} FAILED {type(e).__name__}: "
              + " | ".join(str(e).splitlines()[:1]), flush=True)
        return None


# F: (bh, NSRC, t, hd) source, one take per k/v on axis 1
k_src_f = jnp.asarray(rng.standard_normal((B * HEADS, NSRC, T, HD)), DT)
v_src_f = jnp.asarray(rng.standard_normal((B * HEADS, NSRC, T, HD)), DT)


def var_f(k, v):
    gk = jnp.take(k, idx_flat, axis=1)
    gv = jnp.take(v, idx_flat, axis=1)
    return gk.reshape(B * HEADS, NWIN, S_PAD, T, HD), \
        gv.reshape(B * HEADS, NWIN, S_PAD, T, HD)


t("F (t,hd)-row takes (4.3KB rows)", var_f, k_src_f, v_src_f)

# F2: same but flattened trailing (t*hd) — 2D rows
k2 = k_src_f.reshape(B * HEADS, NSRC, T * HD)
v2 = v_src_f.reshape(B * HEADS, NSRC, T * HD)


def var_f2(k, v):
    gk = jnp.take(k, idx_flat, axis=1)
    gv = jnp.take(v, idx_flat, axis=1)
    return gk, gv


t("F2 flat (t*hd) rows", var_f2, k2, v2)

# F3: both k and v in one source, rows 8.6KB
kv = jnp.concatenate([k2, v2], axis=-1)
t("F3 combined kv 8.6KB rows", lambda z: jnp.take(z, idx_flat, axis=1), kv)

# A baseline re-measure (256B rows)
k_src_a = jnp.asarray(rng.standard_normal((B * HEADS, T, NSRC, HD)), DT)


def var_a1(k):
    return jnp.take(k, idx_flat, axis=2)


t("A one k take (256B rows)", var_a1, k_src_a)
