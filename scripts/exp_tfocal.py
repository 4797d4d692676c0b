"""Where does the transformer stack's ~1 s/call go? (round-2 perf spike)

Ablates one temporal-focal block at the bench geometry (B=8, T=17, 20x36
tokens, 512 ch) into: qkv/proj GEMMs, rolled-key construction, pooled-key
construction, attention core (xla vs flash), F3N. Run:
PYTHONPATH=. python scripts/exp_tfocal.py
"""

import os

import numpy as np

from e2fgvi_tpu.utils import env

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
env.setup()

import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import tfocal
from e2fgvi_tpu.ops.convs import linear
from e2fgvi_tpu.utils.profiling import time_stage

B, T, HH, WW, C = 8, 17, 20, 36, 512
HEADS, WIN, FL = 4, (5, 9), 2
DT = jnp.bfloat16

rng = np.random.default_rng(0)
params = tfocal.init_block_params(jax.random.PRNGKey(0), C, WIN, dtype=DT)
x = jnp.asarray(rng.standard_normal((B, T, HH, WW, C)), DT)


def t(name, fn, *args):
    dt = time_stage(jax.jit(fn), *args, iters=4)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


t("block_full", lambda p, z: tfocal.transformer_block(p, z, (60, 108),
                                                      HEADS, WIN, FL),
  params, x)
t("block_stack8", lambda p, z: tfocal.transformer_stack([p] * 8, z,
                                                        (60, 108), HEADS,
                                                        WIN, FL), params, x)
t("pool_level", lambda p, z: tfocal._pool_level(p, z, WIN), params, x)

pooled = tfocal._pool_level(params, x, WIN)
t("window_attention",
  lambda p, z, pl_: tfocal.window_attention(p["attn"], z, pl_, HEADS, WIN,
                                            (2, 4)), params, x, pooled)
t("window_attention_nopool",
  lambda p, z: tfocal.window_attention(p["attn"], z, None, HEADS, WIN,
                                       (2, 4)), params, x)
t("window_attention_noroll",
  lambda p, z, pl_: tfocal.window_attention(p["attn"], z, pl_, HEADS, WIN,
                                            (0, 0)), params, x, pooled)
t("qkv_gemm", lambda p, z: linear(z, p["attn"]["qkv"]["w"],
                                  p["attn"]["qkv"]["b"]), params, x)
t("f3n", lambda p, z: tfocal.fusion_feed_forward(
    p["mlp"], z.reshape(B, T * HH * WW, C), T, (60, 108)), params, x)

os.environ["E2FGVI_ATTENTION"] = "flash"
t("window_attention_flash",
  lambda p, z, pl_: tfocal.window_attention(p["attn"], z, pl_, HEADS, WIN,
                                            (2, 4)), params, x, pooled)
t("block_full_flash", lambda p, z: tfocal.transformer_block(
    p, z, (60, 108), HEADS, WIN, FL), params, x)
del os.environ["E2FGVI_ATTENTION"]


# --- round-2 optimization candidates --------------------------------------

# 1) F3N with slice-based unfold (no one-hot-conv GEMM: trades 750 GFLOP of
#    MXU work for pure data movement)
from e2fgvi_tpu.ops import patches as _patches

_saved = _patches._MXU_UNFOLD_MAX_CHANNELS
_patches._MXU_UNFOLD_MAX_CHANNELS = 0
t("f3n_slice_unfold", lambda p, z: tfocal.fusion_feed_forward(
    p["mlp"], z.reshape(B, T * HH * WW, C), T, (60, 108)), params, x)
t("block_full_slice_unfold", lambda p, z: tfocal.transformer_block(
    p, z, (60, 108), HEADS, WIN, FL), params, x)
_patches._MXU_UNFOLD_MAX_CHANNELS = _saved

# 2) attention with bf16 logits (halves the softmax HBM traffic; bf16 path
#    only — f32/parity runs keep the f32 softmax)
_saved_attn = tfocal._attention_xla


def _attention_xla_bf16(q_win, k_all, v_all, bias_full, b):
    dtype = q_win.dtype
    attn = jnp.einsum("bhqd,bhkd->bhqk", q_win, k_all)
    attn = attn + jnp.tile(bias_full, (b, 1))[:, None, None, :].astype(dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v_all)


tfocal._attention_xla = _attention_xla_bf16
t("window_attention_bf16sm",
  lambda p, z, pl_: tfocal.window_attention(p["attn"], z, pl_, HEADS, WIN,
                                            (2, 4)), params, x, pooled)
t("block_full_bf16sm", lambda p, z: tfocal.transformer_block(
    p, z, (60, 108), HEADS, WIN, FL), params, x)
tfocal._attention_xla = _saved_attn

# 3) flash attention with tuned block sizes
from jax.experimental.pallas.ops.tpu import flash_attention as fa

_saved_flash = tfocal._attention_flash

for bq, bkM, bk in ((256, 1792, 512), (768, 3584, 512), (768, 896, 896)):
    def _flash_tuned(q_win, k_all, v_all, bias_full, b, _bs=(bq, bkM, bk)):
        import functools
        bq_, bkM_, bk_ = _bs
        bw, heads, nq, hd = q_win.shape
        nk = k_all.shape[2]
        pad_q = (-nq) % 256
        pad_k = (-nk) % 512
        q = jnp.pad(q_win, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k_all, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v_all, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        q_seg = jnp.concatenate(
            [jnp.zeros((bw, nq), jnp.int32),
             jnp.full((bw, pad_q), 1, jnp.int32)], axis=1)
        kv_mask = (jnp.tile(bias_full, (b, 1)) < -50.0)
        kv_seg = jnp.concatenate(
            [jnp.where(kv_mask, 2, 0).astype(jnp.int32),
             jnp.full((bw, pad_k), 2, jnp.int32)], axis=1)
        nkp = nk + pad_k
        bs = fa.BlockSizes(block_q=min(bq_, nq + pad_q),
                           block_k_major=min(bkM_, nkp),
                           block_k=min(bk_, nkp), block_b=1)
        out = fa.flash_attention(
            q, k, v, segment_ids=fa.SegmentIds(q=q_seg, kv=kv_seg),
            sm_scale=1.0, block_sizes=bs)
        return out[:, :, :nq, :].astype(q_win.dtype)

    tfocal._attention_flash = _flash_tuned
    os.environ["E2FGVI_ATTENTION"] = "flash"
    try:
        t(f"window_attention_flash_q{bq}_kM{bkM}_k{bk}",
          lambda p, z, pl_: tfocal.window_attention(
              p["attn"], z, pl_, HEADS, WIN, (2, 4)), params, x, pooled)
    except Exception as e:
        print(f"flash q{bq} kM{bkM} k{bk}: FAILED {type(e).__name__}: {e}",
              flush=True)
    del os.environ["E2FGVI_ATTENTION"]
tfocal._attention_flash = _saved_flash
