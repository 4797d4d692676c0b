"""Band-assembled focal attention kernel (r04 candidate v3).

The fused attention path's remaining XLA-side cost is the jnp.take that
expands compact k/v maps into the per-window gathered layout: 1.75 GB of
256-byte rows, 17.6 ms/block (results/exp_fused_attn_r04.txt) — as large
as the kernel itself. This candidate removes the take:

- XLA builds overlapping ROW BANDS of the wrap-padded k/v maps — nwy bulk
  slices, (B, heads, T, nwy, wh+2eh, W+2ew, hd) — plus tiny pooled bands.
  Bulk slices ride DMA at full bandwidth (0.77 GB total vs the take's
  1.75 GB of row-issue gather).
- the Pallas grid is (B, heads, wy); the kernel assembles each of the
  row's nwx windows' keys from STATIC slices of its band block into a
  (T, S_pad, hd) VMEM scratch (the rolled-rect offsets relative to the
  band are wy-independent), then runs the same whole-window softmax as
  kernels/fused_attention.py.

Exactness vs the gather path: same key multiset per (window, frame) —
within-frame fine order differs (rect-major vs valid-idx order), which is
irrelevant because softmax is permutation-invariant, all fine slots share
bias 0, and v is assembled in the same order as k.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_attn_band_r04.py
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

from e2fgvi_tpu.models import tfocal  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, T, HH, WW, C = 14, 17, 20, 36, 512
HEADS, WIN, EXP = 4, (5, 9), (2, 4)
HD = C // HEADS
DT = jnp.bfloat16

WH, WWIN = WIN
EH, EW = EXP
NWY, NWX = HH // WH, WW // WWIN
PK = (2 * (WH // 2) + 1, 2 * (WWIN // 2) + 1)     # (5, 9)
PP = (PK[0] // 2, PK[1] // 2)
RECTS = tfocal._rolled_rects(WH, WWIN, EH, EW)
N_OWN = WH * WWIN
N_ROLL = sum((y1 - y0) * (x1 - x0) for _, _, y0, y1, x0, x1 in RECTS)
N_POOL = PK[0] * PK[1]
S_KEYS = N_OWN + N_ROLL + N_POOL
S_PAD = -(-S_KEYS // 16) * 16
NQ = T * WH * WWIN
NQ_PAD = -(-NQ // 16) * 16
BH = WH + 2 * EH                                   # band rows
BW = WW + 2 * EW                                   # padded width


def _kernel(bias_ref, q_ref, kb_ref, vb_ref, kp_ref, vp_ref, o_ref,
            kasm_ref, vasm_ref):
    # zero the pad slots once; their bias is -1e9 anyway
    kasm_ref[:, S_KEYS:] = jnp.zeros((T, S_PAD - S_KEYS, HD), DT)
    vasm_ref[:, S_KEYS:] = jnp.zeros((T, S_PAD - S_KEYS, HD), DT)
    for wx in range(NWX):
        for asm, band, pool in ((kasm_ref, kb_ref, kp_ref),
                                (vasm_ref, vb_ref, vp_ref)):
            ox = EW + wx * WWIN
            asm[:, :N_OWN] = band[0, 0, :, 0, EH: EH + WH,
                                  ox: ox + WWIN, :].reshape(T, N_OWN, HD)
            off = N_OWN
            for (sy, sx, y0, y1, x0, x1) in RECTS:
                ry = y0 - sy + EH
                rx = wx * WWIN + x0 - sx + EW
                ln = (y1 - y0) * (x1 - x0)
                asm[:, off: off + ln] = band[
                    0, 0, :, 0, ry: ry + (y1 - y0), rx: rx + (x1 - x0), :
                ].reshape(T, ln, HD)
                off += ln
            asm[:, off: off + N_POOL] = pool[
                0, 0, :, 0, :, wx: wx + PK[1], :].reshape(T, N_POOL, HD)
        k = kasm_ref[...].reshape(T * S_PAD, HD)
        v = vasm_ref[...].reshape(T * S_PAD, HD)
        q = q_ref[0, wx]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[0, 0, wx][None, :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0, wx] = (o * (1.0 / l)).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build(b):
    nk = T * S_PAD
    return pl.pallas_call(
        _kernel,
        grid=(b, HEADS, NWY),
        in_specs=[
            pl.BlockSpec((1, 1, NWX, nk), lambda i, h, wy: (i, wy, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NWX, NQ_PAD, HD),
                         lambda i, h, wy: ((i * HEADS + h) * NWY + wy,
                                           0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, 1, BH, BW, HD),
                         lambda i, h, wy: (i, h, 0, wy, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, 1, BH, BW, HD),
                         lambda i, h, wy: (i, h, 0, wy, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, 1, PK[0], NWX + 2 * PP[1], HD),
                         lambda i, h, wy: (i, h, 0, wy, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, 1, PK[0], NWX + 2 * PP[1], HD),
                         lambda i, h, wy: (i, h, 0, wy, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, NWX, NQ_PAD, HD),
                               lambda i, h, wy: (i, wy, 0, 0, h)),
        out_shape=jax.ShapeDtypeStruct((b, NWY, NWX, NQ_PAD, HEADS * HD),
                                       DT),
        scratch_shapes=[pltpu.VMEM((T, S_PAD, HD), DT),
                        pltpu.VMEM((T, S_PAD, HD), DT)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )


def band_attention(params, x, pooled, frame_valid=None):
    """Assembles inputs + calls the band kernel. Mirrors
    tfocal._window_attention_fused's outer contract."""
    b, t, h, w, c = x.shape
    wq = params["qkv"]["w"].reshape(c, 3, HEADS, HD)
    bq = params["qkv"]["b"].reshape(3, HEADS, HD)
    qkv = jnp.einsum("btyxc,cghd->gbhtyxd", x, wq.astype(x.dtype))
    qkv = qkv + bq[:, None, :, None, None, None, :].astype(qkv.dtype)
    q, k, v = qkv[0], qkv[1], qkv[2]

    pq = jnp.einsum("byxtc,cghd->gbhtyxd", pooled, wq.astype(x.dtype))
    pq = pq + bq[:, None, :, None, None, None, :].astype(pq.dtype)

    pad_f = ((0, 0), (0, 0), (0, 0), (EH, EH), (EW, EW), (0, 0))
    pad_p = ((0, 0), (0, 0), (0, 0), (PP[0], PP[0]), (PP[1], PP[1]),
             (0, 0))

    def bands(z):
        zp = jnp.pad(z, pad_f, mode="wrap")       # (b,h,t,H+2eh,W+2ew,hd)
        return jnp.stack([zp[:, :, :, wy * WH: wy * WH + BH]
                          for wy in range(NWY)], axis=3)

    def pbands(zp):
        zq = jnp.pad(zp, pad_p)                   # (b,h,t,nwy+2pp,nwx+2pp,hd)
        return jnp.stack([zq[:, :, :, wy: wy + PK[0]]
                          for wy in range(NWY)], axis=3)

    kb, vb = bands(k), bands(v)
    kpb, vpb = pbands(pq[1]), pbands(pq[2])

    scale = HD ** -0.5
    qw = (q * scale).reshape(b, HEADS, t, NWY, WH, NWX, WWIN, HD)
    qw = qw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b * HEADS * NWY, NWX, NQ, HD)
    qw = jnp.pad(qw, ((0, 0), (0, 0), (0, NQ_PAD - NQ), (0, 0)))

    # bias per (wy, wx, frame, slot): 0 fine, pooled -100 pattern, -1e9
    # pad slots / pad frames — rect-major fine order (bias is uniform over
    # fine slots so only the pooled/pad tails need care)
    pm = tfocal._pooled_key_mask(NWY, NWX, PK[0], PK[1], *PP)  # (nwin,45)
    bias_win = np.full((NWY * NWX, S_PAD), -1e9, np.float32)
    bias_win[:, :S_KEYS] = 0.0
    bias_win[:, N_OWN + N_ROLL: S_KEYS] = pm
    bias = jnp.broadcast_to(
        jnp.asarray(bias_win)[None, :, None, :],
        (b, NWY * NWX, t, S_PAD))
    if frame_valid is not None:
        bias = jnp.where(~frame_valid[:, None, :, None], -1e9, bias)
    bias = bias.reshape(b, NWY, NWX, t * S_PAD)

    with jax.default_matmul_precision("default"):
        out = _build(b)(bias, qw, kb, vb, kpb, vpb)
    # (b, nwy, nwx, nq_pad, C) -> (b*nwin, nq, C)
    out = out.reshape(b * NWY * NWX, NQ_PAD, C)[:, :NQ]
    from e2fgvi_tpu.ops.convs import linear
    return linear(out, params["proj"]["w"], params["proj"]["b"])


def main():
    rng = np.random.default_rng(0)
    params = tfocal.init_block_params(jax.random.PRNGKey(0), C, WIN,
                                      dtype=DT)
    x = jnp.asarray(rng.standard_normal((B, T, HH, WW, C)), DT)
    pooled = jax.jit(lambda p, z: tfocal._pool_level(p, z, WIN))(params, x)

    def attn_fused(p, z, pz):
        return tfocal.window_attention(p["attn"], z, pz, HEADS, WIN, EXP)

    os.environ["E2FGVI_ATTENTION"] = "fused"
    dt = time_stage(jax.jit(attn_fused), params, x, pooled, iters=4)
    print(f"window_attention(fused/take)   {dt * 1e3:8.2f} ms", flush=True)

    dt = time_stage(jax.jit(band_attention), params["attn"], x, pooled,
                    iters=4)
    print(f"window_attention(band)         {dt * 1e3:8.2f} ms", flush=True)

    got = np.asarray(jax.jit(band_attention)(params["attn"], x, pooled)
                     ).astype(np.float32)
    want = np.asarray(jax.jit(attn_fused)(params, x, pooled)
                      ).astype(np.float32)
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    print(f"parity max|band-fused| = {err:.3e} (rel {err / scale:.3e})",
          flush=True)

    # frame_valid parity
    fv = np.ones((B, T), np.bool_)
    fv[0, -3:] = False
    fv[1, -1] = False
    fvj = jnp.asarray(fv)

    def attn_fused_fv(p, z, pz):
        return tfocal.window_attention(p["attn"], z, pz, HEADS, WIN, EXP,
                                       frame_valid=fvj)

    got = np.asarray(jax.jit(
        lambda p, z, pz: band_attention(p, z, pz, fvj))(
            params["attn"], x, pooled)).astype(np.float32)
    want = np.asarray(jax.jit(attn_fused_fv)(params, x, pooled)
                      ).astype(np.float32)
    # compare only valid queries (t-major per window)
    valid_q = np.repeat(fv, WH * WWIN, axis=1)
    valid_q = np.repeat(valid_q, NWY * NWX, axis=0)[..., None]
    err = np.abs(np.where(valid_q, got - want, 0.0)).max()
    print(f"parity (frame_valid)           = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
