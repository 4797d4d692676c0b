"""A/B the fused attention's r05 levers on TPU, in one process:

1. the k/v take itself: full multiset (S_pad 176) vs deduped table
   (S_pad 128, log-multiplicity bias — models/tfocal._key_gather_dedup),
   each as two bf16 takes vs one packed int32 take;
2. the whole window_attention stage at the bench window geometry for the
   dedupe x gather combinations (distinct closures per combo — env vars
   are read at trace time).

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_attn_r05.py
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

B, HEADS, T, GH, GW, C = 14, 4, 17, 20, 36, 512
HD = C // HEADS
WH, WW = 5, 9
EH, EW = 2, 4
NWH, NWW = GH // WH, GW // WW
GEOM = (NWH, NWW, 2 * (WH // 2) + 1, 2 * (WW // 2) + 1, WH // 2, WW // 2)


def take_timings(rng):
    k = jnp.asarray(rng.standard_normal((B * HEADS, T, GH * GW, HD)),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B * HEADS, T, GH * GW, HD)),
                    jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((B * HEADS, T, NWH * NWW, HD)),
                     jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((B * HEADS, T, NWH * NWW, HD)),
                     jnp.bfloat16)
    zero_slot = GH * GW + NWH * NWW

    tables = {}
    idx, _ = tfocal._key_gather_idx(GH, GW, WH, WW, EH, EW, GEOM)
    idx = idx[:, WH * WW:]
    tables["full"] = idx
    tables["dedup"] = tfocal._key_gather_dedup(GH, GW, WH, WW, EH, EW,
                                               GEOM)[0]

    for name, tab in tables.items():
        nwin, s_keys = tab.shape
        s_pad = -(-s_keys // 16) * 16
        idx_pad = np.full((nwin, s_pad), zero_slot, np.int32)
        idx_pad[:, :s_keys] = tab
        idx_j = jnp.asarray(idx_pad.reshape(-1))

        def two_takes(k, kp, v, vp, idx_j=idx_j, s_pad=s_pad, nwin=nwin):
            def gather(z, zp):
                src = jnp.concatenate([
                    z, zp, jnp.zeros((B * HEADS, T, 1, HD), z.dtype)],
                    axis=2)
                return jnp.take(src, idx_j, axis=2).reshape(
                    B * HEADS, T, nwin, s_pad, HD)
            return gather(k, kp), gather(v, vp)

        def packed_take(k, kp, v, vp, idx_j=idx_j, s_pad=s_pad,
                        nwin=nwin):
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

        for tname, fn in (("two", two_takes), ("packed", packed_take)):
            dt = time_stage(jax.jit(fn), k, kp, v, vp, iters=8)
            print(f"take[{name:5s} s_pad={s_pad:3d} {tname:6s}] "
                  f"{dt * 1e3:7.2f} ms", flush=True)


def full_attention_timings(rng):
    params = tfocal.init_block_params(jax.random.PRNGKey(0), C, (WH, WW),
                                      d_ff=1960)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jnp.asarray(rng.standard_normal((B, T, GH, GW, C)), jnp.bfloat16)
    pooled = jax.jit(
        lambda p, z: tfocal._pool_level(p, z, (WH, WW)))(params, x)

    # NOTE (r05 outcome): gather=packed LOST (25.97 -> 30.10 ms with
    # dedupe on) and was removed from models/tfocal.py; this harness now
    # only sweeps the dedupe axis. The recorded 4-way sweep is in
    # results/exp_attn_r05.txt.
    ref = None
    for dedupe in ("off", "on"):
        os.environ["E2FGVI_ATTN_DEDUPE"] = dedupe

        def attn(p, z, pz):
            return tfocal.window_attention(p["attn"], z, pz, HEADS,
                                           (WH, WW), (EH, EW))

        fn = jax.jit(attn)
        out = np.asarray(fn(params, x, pooled)).astype(np.float32)
        if ref is None:
            ref = out
        else:
            err = np.abs(out - ref).max() / np.abs(ref).max()
            assert err < 2e-2, (dedupe, err)
        dt = time_stage(fn, params, x, pooled, iters=8)
        print(f"window_attention[dedupe={dedupe:3s}] {dt * 1e3:7.2f} ms",
              flush=True)
    del os.environ["E2FGVI_ATTN_DEDUPE"]


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    take_timings(rng)
    full_attention_timings(rng)
