"""A/B the round-4 fused focal attention (gather layout + Pallas kernel)
against the round-3 slice-assembly + flash path at the bench geometry
(B=14, T=17, 20x36 tokens, bf16).

r03 baseline (results/exp_tfocal_b14_r03.txt):
  key_assembly(k+v)   35.64 ms   attention_flash(core) 19.87 ms
  window_attention    53.39 ms   block_full            69.30 ms

Run (TPU): PYTHONPATH=. python scripts/exp_fused_attn_r04.py
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
        print(f"{name:36s} {dt * 1e3:8.2f} ms  (x8 blocks = "
              f"{dt * 8e3:7.1f} ms)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        print(f"{name:36s} FAILED {type(e).__name__}: "
              + " | ".join(str(e).splitlines()[:1]), flush=True)
        return None


pooled = jax.jit(lambda p, z: tfocal._pool_level(p, z, WIN))(params, x)


def attn(p, z, pz):
    return tfocal.window_attention(p["attn"], z, pz, HEADS, WIN, EXP)


def qkv_maps(p, z, pz):
    hd = C // HEADS
    wq = p["attn"]["qkv"]["w"].reshape(C, 3, HEADS, hd)
    bq = p["attn"]["qkv"]["b"].reshape(3, HEADS, hd)
    qkv = jnp.einsum("btyxc,cghd->gbhtyxd", z, wq.astype(z.dtype))
    qkv = qkv + bq[:, None, :, None, None, None, :].astype(qkv.dtype)
    pq = jnp.einsum("byxtc,cghd->gbhtyxd", pz, wq.astype(z.dtype))
    pq = pq + bq[:, None, :, None, None, None, :].astype(pq.dtype)
    return qkv[0], qkv[1], qkv[2], pq


def gather_only(p, z, pz):
    """qkv + take-gather of k/v into the fused layout (no attention)."""
    q, k, v, pq = qkv_maps(p, z, pz)
    b, heads, tt, h, w, hd = q.shape
    wh, ww = WIN
    nwh, nww = pq.shape[4], pq.shape[5]
    pk = (2 * (wh // 2) + 1, 2 * (ww // 2) + 1)
    pp = (pk[0] // 2, pk[1] // 2)
    idx, n_fine = tfocal._key_gather_idx(
        h, w, wh, ww, *EXP, (nwh, nww, pk[0], pk[1], pp[0], pp[1]))
    nwin = idx.shape[0]
    s_keys = idx.shape[1]
    s_pad = -(-s_keys // 16) * 16
    zero_slot = h * w + nwh * nww
    idx_pad = np.full((nwin, s_pad), zero_slot, np.int32)
    idx_pad[:, :s_keys] = idx

    def gather(zm, zp):
        src = jnp.concatenate([
            zm.reshape(b * heads, tt, h * w, hd),
            zp.reshape(b * heads, tt, nwh * nww, hd),
            jnp.zeros((b * heads, tt, 1, hd), zm.dtype)], axis=2)
        g = jnp.take(src, jnp.asarray(idx_pad.reshape(-1)), axis=2)
        return g.reshape(b * heads, tt, nwin, s_pad, hd)

    return gather(k, pq[1]), gather(v, pq[2])


def fused_full(p, z, pz):
    hd = C // HEADS
    q, k, v, pq = qkv_maps(p, z, pz)
    return tfocal._window_attention_fused(
        p["attn"], q, k, v, pq, hd ** -0.5, WIN, EXP, None)


# baseline (round-3 default path)
os.environ["E2FGVI_ATTENTION"] = "flash"
t("window_attention(flash,r03)", attn, params, x, pooled)
os.environ["E2FGVI_ATTENTION"] = "fused"

t("qkv_maps(only)", qkv_maps, params, x, pooled)
t("gather_assembly(k+v)", gather_only, params, x, pooled)
t("window_attention(fused)", fused_full, params, x, pooled)

# kernel core alone, on pre-gathered inputs
k_gath, v_gath = jax.jit(gather_only)(params, x, pooled)
bh, tt, nwin, s_pad, hd = k_gath.shape
nq = T * WIN[0] * WIN[1]
nq_pad = -(-nq // 16) * 16
qw = jnp.asarray(rng.standard_normal((B * HEADS * nwin, nq_pad, hd)), DT)
bias = jnp.zeros((B, nwin, T * s_pad), jnp.float32)

from e2fgvi_tpu.kernels.fused_attention import fused_focal_attention  # noqa: E402

t("fused_kernel(core)", lambda q, k, v, bb: fused_focal_attention(
    q, k, v, bb, B, HEADS), qw, k_gath, v_gath, bias)

# whole block / stack with the fused backend
t("block_full(fused)", lambda p, z: tfocal.transformer_block(
    p, z, OUT, HEADS, WIN, FL), params, x)
stacked8 = [params] * 8
t("stack8_scan(fused)", lambda ps, z: tfocal.transformer_stack(
    ps, z, OUT, HEADS, WIN, FL), stacked8, x)

# numerical parity vs the XLA reference formulation
os.environ["E2FGVI_ATTENTION"] = "xla"
ref = jax.jit(attn)(params, x, pooled)
os.environ["E2FGVI_ATTENTION"] = "fused"
got = jax.jit(fused_full)(params, x, pooled)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
print(f"parity max|fused-xla| = {err:.3e}  (rel {err / scale:.3e})",
      flush=True)
