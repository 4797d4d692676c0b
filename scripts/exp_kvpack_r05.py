"""A/B: single int32-packed k/v gather vs two bf16 gathers (fused attn).

The fused attention's dominant cost is the jnp.take into the
(B*heads, T, nWin, S_pad, hd) gather layout, done twice with IDENTICAL
indices (k and v). Packing k into the high and v into the low 16 bits of
one int32 source halves the gather's row count (the DCN sampler's packed
single-gather won 34.1 -> 28.9 ms the same way, exp_dcn_inner_r04).
Unpack is exact: bf16 -> f32 widening appends zero bits, so
bitcast(x & 0xffff0000) == k and bitcast(x << 16) == v, both exactly.

Run (TPU): python scripts/exp_kvpack_r05.py
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

from e2fgvi_tpu.models import tfocal  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

# bench window-stage geometry: B=14 windows, T=17 frames, 20x36 token
# grid, 4 heads x hd 128, window (5,9) -> nwin 16
B, HEADS, T, GH, GW, HD = 14, 4, 17, 20, 36, 128
WH, WW = 5, 9
EH, EW = 2, 4
NWH, NWW = GH // WH, GW // WW


def main():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((B * HEADS, T, GH * GW, HD)),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B * HEADS, T, GH * GW, HD)),
                    jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((B * HEADS, T, NWH * NWW, HD)),
                     jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((B * HEADS, T, NWH * NWW, HD)),
                     jnp.bfloat16)

    idx, n_fine = tfocal._key_gather_idx(
        GH, GW, WH, WW, EH, EW,
        (NWH, NWW, 2 * (WH // 2) + 1, 2 * (WW // 2) + 1,
         WH // 2, WW // 2))
    wa = WH * WW
    idx = idx[:, wa:]
    s_keys = idx.shape[1]
    s_pad = -(-s_keys // 16) * 16
    nwin = idx.shape[0]
    zero_slot = GH * GW + NWH * NWW
    idx_pad = np.full((nwin, s_pad), zero_slot, np.int32)
    idx_pad[:, :s_keys] = idx
    idx_j = jnp.asarray(idx_pad.reshape(-1))
    print(f"nwin={nwin} s_keys={s_keys} s_pad={s_pad}", flush=True)

    @jax.jit
    def two_takes(k, kp, v, vp):
        def gather(z, zp):
            src = jnp.concatenate([
                z, zp, jnp.zeros((B * HEADS, T, 1, HD), z.dtype)], axis=2)
            g = jnp.take(src, idx_j, axis=2)
            return g.reshape(B * HEADS, T, nwin, s_pad, HD)
        return gather(k, kp), gather(v, vp)

    @jax.jit
    def packed_take(k, kp, v, vp):
        def pack(a, b_):
            hi = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(
                jnp.uint32) << 16
            lo = jax.lax.bitcast_convert_type(b_, jnp.uint16).astype(
                jnp.uint32)
            return (hi | lo).astype(jnp.int32)
        src = jnp.concatenate([
            pack(k, v), pack(kp, vp),
            jnp.zeros((B * HEADS, T, 1, HD), jnp.int32)], axis=2)
        g = jnp.take(src, idx_j, axis=2).reshape(
            B * HEADS, T, nwin, s_pad, HD)
        gk = jax.lax.bitcast_convert_type(
            (g & jnp.int32(-65536)), jnp.float32).astype(jnp.bfloat16)
        gv = jax.lax.bitcast_convert_type(
            (g << 16), jnp.float32).astype(jnp.bfloat16)
        return gk, gv

    @jax.jit
    def packed_take_raw(k, kp, v, vp):
        """packed gather WITHOUT the XLA unpack (what a kernel-side unpack
        would leave outside the kernel)."""
        def pack(a, b_):
            hi = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(
                jnp.uint32) << 16
            lo = jax.lax.bitcast_convert_type(b_, jnp.uint16).astype(
                jnp.uint32)
            return (hi | lo).astype(jnp.int32)
        src = jnp.concatenate([
            pack(k, v), pack(kp, vp),
            jnp.zeros((B * HEADS, T, 1, HD), jnp.int32)], axis=2)
        return jnp.take(src, idx_j, axis=2).reshape(
            B * HEADS, T, nwin, s_pad, HD)

    # parity
    k2, v2 = jax.jit(two_takes)(k, kp, v, vp)
    k1, v1 = jax.jit(packed_take)(k, kp, v, vp)
    dk = float(jnp.abs(k1.astype(jnp.float32) -
                       k2.astype(jnp.float32)).max())
    dv = float(jnp.abs(v1.astype(jnp.float32) -
                       v2.astype(jnp.float32)).max())
    print(f"parity: max|dk|={dk:.2e} max|dv|={dv:.2e}", flush=True)

    for name, fn in [("two bf16 takes", two_takes),
                     ("packed int32 take + XLA unpack", packed_take),
                     ("packed int32 take (raw)", packed_take_raw)]:
        dt = time_stage(fn, k, kp, v, vp, iters=8)
        print(f"{name:34s} {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
