"""Fine-grained breakdown of the CURRENT transformer block at serving
geometry (B=14, T=17, 20x36 tokens, 512 ch, bf16, flash attention,
conv-form F3N, slice-assembled keys).

Round-2 data (exp_tfocal.py, B=8) predates the slice-assembly/scan rework;
this script times every piece of the block as it ships today so one TPU
run pinpoints the remaining overhead vs the ~6 ms/block FLOP floor.

Run (TPU): PYTHONPATH=. python scripts/exp_tfocal_b14.py
"""

import os

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.models import tfocal  # noqa: E402
from e2fgvi_tpu.ops.convs import linear  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, T, HH, WW, C = 14, 17, 20, 36, 512
HEADS, WIN, FL = 4, (5, 9), 2
EXP = (WIN[0] // 2, WIN[1] // 2)
OUT = (60, 108)
DT = jnp.bfloat16

rng = np.random.default_rng(0)
params = tfocal.init_block_params(jax.random.PRNGKey(0), C, WIN, dtype=DT)
x = jnp.asarray(rng.standard_normal((B, T, HH, WW, C)), DT)


def t(name, fn, *args):
    try:
        dt = time_stage(jax.jit(fn), *args, iters=4)
        print(f"{name:32s} {dt * 1e3:8.2f} ms  (x8 blocks = "
              f"{dt * 8e3:7.1f} ms)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:32s} FAILED {type(e).__name__}: "
              + " | ".join(str(e).splitlines()[:1]), flush=True)
        return None


# ---- whole block / whole stack ------------------------------------------
t("block_full", lambda p, z: tfocal.transformer_block(
    p, z, OUT, HEADS, WIN, FL), params, x)

stacked8 = [params] * 8
t("stack8_scan", lambda ps, z: tfocal.transformer_stack(
    ps, z, OUT, HEADS, WIN, FL), stacked8, x)

# ---- block pieces ---------------------------------------------------------
t("layer_norm", lambda p, z: tfocal.layer_norm(
    z, p["norm1"]["g"], p["norm1"]["b"]), params, x)
t("pool_level", lambda p, z: tfocal._pool_level(p, z, WIN), params, x)

wh, ww = WIN
nwy, nwx = HH // wh, WW // ww
nwin = nwy * nwx


def qkv_only(p, z):
    wq = p["attn"]["qkv"]["w"].reshape(C, 3, HEADS, C // HEADS)
    return jnp.einsum("btyxc,cghd->gbhtyxd", z, wq.astype(z.dtype))


t("qkv_einsum", qkv_only, params, x)

pooled = jax.jit(lambda p, z: tfocal._pool_level(p, z, WIN))(params, x)


def attn_full(p, z, pz):
    return tfocal.window_attention(p["attn"], z, pz, HEADS, WIN, EXP)


t("window_attention(full)", attn_full, params, x, pooled)


def keys_only(p, z, pz):
    """qkv + slice-assembly of k_all/v_all/q_win, no attention core."""
    hd = C // HEADS
    wq = p["attn"]["qkv"]["w"].reshape(C, 3, HEADS, hd)
    bq = p["attn"]["qkv"]["b"].reshape(3, HEADS, hd)
    qkv = jnp.einsum("btyxc,cghd->gbhtyxd", z, wq.astype(z.dtype))
    qkv = qkv + bq[:, None, :, None, None, None, :].astype(qkv.dtype)
    q, k, v = qkv[0], qkv[1], qkv[2]
    pk = (2 * (wh // 2) + 1, 2 * (ww // 2) + 1)
    pp = (pk[0] // 2, pk[1] // 2)
    pq = jnp.einsum("byxtc,cghd->gbhtyxd", pz, wq.astype(z.dtype))
    pad_p = ((0, 0), (0, 0), (0, 0), (pp[0], pp[0]), (pp[1], pp[1]), (0, 0))
    kp = jnp.pad(pq[1], pad_p)
    vp = jnp.pad(pq[2], pad_p)
    rects = tfocal._rolled_rects(wh, ww, *EXP)
    pad_f = ((0, 0), (0, 0), (0, 0), (EXP[0], EXP[0]), (EXP[1], EXP[1]),
             (0, 0))
    kf = jnp.pad(k, pad_f, mode="wrap")
    vf = jnp.pad(v, pad_f, mode="wrap")

    def win_keys(z5, zp, wy, wx):
        parts = []
        oy = wy * wh + EXP[0]
        ox = wx * ww + EXP[1]
        parts.append(z5[:, :, :, oy: oy + wh, ox: ox + ww, :])
        for (sy, sx, y0, y1, x0, x1) in rects:
            ry = wy * wh + y0 - sy + EXP[0]
            rx = wx * ww + x0 - sx + EXP[1]
            parts.append(z5[:, :, :, ry: ry + (y1 - y0),
                            rx: rx + (x1 - x0), :])
        parts.append(zp[:, :, :, wy: wy + pk[0], wx: wx + pk[1], :])
        flat = [pp_.reshape(B, HEADS, T, -1, hd) for pp_ in parts]
        return jnp.concatenate(flat, axis=3)

    def assemble(z5, zp):
        wins = [win_keys(z5, zp, wy, wx)
                for wy in range(nwy) for wx in range(nwx)]
        g = jnp.stack(wins, axis=1)
        return g.reshape(B * nwin, HEADS, -1, hd)

    return assemble(kf, kp), assemble(vf, vp)


t("key_assembly(k+v)", keys_only, params, x, pooled)

# prebuilt q/k/v -> attention core alone
k_all, v_all = jax.jit(keys_only)(params, x, pooled)
s_keys = k_all.shape[2] // T
pk = (2 * (wh // 2) + 1, 2 * (ww // 2) + 1)
n_fine = s_keys - pk[0] * pk[1]
hd = C // HEADS
q_win = jnp.asarray(
    rng.standard_normal((B * nwin, HEADS, T * wh * ww, hd)), DT)
pm = np.asarray(tfocal._pooled_key_mask(nwy, nwx, pk[0], pk[1],
                                        pk[0] // 2, pk[1] // 2))
bias_win = np.zeros((nwin, s_keys), np.float32)
bias_win[:, n_fine:] = pm
bias_full = jnp.asarray(
    np.tile(np.tile(bias_win[:, None, :], (1, T, 1)).reshape(
        nwin, T * s_keys), (B, 1)))

t("attention_flash(core)", tfocal._attention_flash,
  q_win, k_all, v_all, bias_full, B)
t("attention_xla(core)", tfocal._attention_xla,
  q_win, k_all, v_all, bias_full, B)

for bq_env in ("128", "256", "512"):
    os.environ["E2FGVI_FA_BQ"] = bq_env
    t(f"attention_flash(bq<={bq_env})", tfocal._attention_flash,
      q_win, k_all, v_all, bias_full, B)
    del os.environ["E2FGVI_FA_BQ"]

t("proj_linear", lambda p, z: linear(
    z, p["attn"]["proj"]["w"], p["attn"]["proj"]["b"]),
  params, jnp.asarray(rng.standard_normal(
      (B * nwin, T * wh * ww, C)), DT))

# ---- F3N pieces -----------------------------------------------------------
tok = jnp.asarray(rng.standard_normal((B, T * HH * WW, C)), DT)
t("f3n_conv(full)", lambda p, z: tfocal._fusion_feed_forward_conv(
    p["mlp"], z, T, OUT), params, tok)
os.environ["E2FGVI_F3N"] = "gemm"
t("f3n_gemm(full)", lambda p, z: tfocal.fusion_feed_forward(
    p["mlp"], z, T, OUT), params, tok)
del os.environ["E2FGVI_F3N"]


def f3n_conv1(p, z):
    """first conv (tokens->pixel phases) + depth-to-space only"""
    from e2fgvi_tpu.models.tfocal import (T2T_KERNEL, T2T_PADDING,
                                          T2T_STRIDE, token_grid)
    hh2, ww2 = OUT
    kh, kw = T2T_KERNEL
    sh, sw = T2T_STRIDE
    ph, pw = T2T_PADDING
    lh, lw = token_grid(OUT)
    b, n, c = z.shape
    bt = b * (n // (lh * lw))
    cc = p["mlp"]["fc1"]["w"].shape[-1] // (kh * kw)
    xt = z.reshape(bt, lh, lw, c)
    w1 = p["mlp"]["fc1"]["w"].reshape(c, kh, kw, cc)
    k1 = jnp.flip(w1, axis=(1, 2)).transpose(1, 2, 0, 3).astype(xt.dtype)
    dlo = -(-ph // sh)
    dhi = (sh - 1 - ph + kh - 1) // sh
    dxlo = -(-pw // sw)
    dxhi = (sw - 1 - pw + kw - 1) // sw
    ksub = jnp.zeros((dlo + dhi + 1, dxlo + dxhi + 1, c, sh, sw, cc),
                     k1.dtype)
    for pph in range(sh):
        for q in range(sw):
            for dy in range(-dlo, dhi + 1):
                ky = sh * dy - pph + ph
                if not 0 <= ky < kh:
                    continue
                for dx in range(-dxlo, dxhi + 1):
                    kx = sw * dx - q + pw
                    if not 0 <= kx < kw:
                        continue
                    ksub = ksub.at[dy + dlo, dx + dxlo, :, pph, q, :].set(
                        k1[ky, kx])
    ksub = ksub.reshape(dlo + dhi + 1, dxlo + dxhi + 1, c, sh * sw * cc)
    zs = jax.lax.conv_general_dilated(
        xt, ksub, window_strides=(1, 1),
        padding=((dlo, dhi), (dxlo, dxhi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    zs = zs.reshape(bt, lh, lw, sh, sw, cc).transpose(0, 1, 3, 2, 4, 5)
    return zs.reshape(bt, lh * sh, lw * sw, cc)[:, :hh2, :ww2]


t("f3n_conv1+d2s", f3n_conv1, params, tok)

pix = jnp.asarray(rng.standard_normal((B * T, 60, 108, 40)), DT)


def f3n_conv2(p, z):
    w2 = p["mlp"]["fc2"]["w"].reshape(7, 7, 40, C).astype(z.dtype)
    return jax.lax.conv_general_dilated(
        jax.nn.gelu(z), w2, window_strides=(3, 3), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


t("f3n_gelu+conv2", f3n_conv2, params, pix)
