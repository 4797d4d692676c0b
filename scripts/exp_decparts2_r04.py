"""Piecewise soft_comp / decode timings (r04) — find the 20-50 ms of glue.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_decparts2_r04.py
"""
import os
import numpy as np
os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
from e2fgvi_tpu.utils import env
env.setup()
import jax
import jax.numpy as jnp
from e2fgvi_tpu.models import e2fgvi
from e2fgvi_tpu.ops.convs import conv2d, linear, leaky_relu
from e2fgvi_tpu.ops.patches import fold
from e2fgvi_tpu.ops.resize import resize_scale2_aligned
from e2fgvi_tpu.utils.profiling import time_stage

B, L = 14, 11
HQ, WQ, C = 60, 108, 128
LH, LW, HID = 20, 36, 512
DT = jnp.bfloat16


def t(name, fn, *args):
    try:
        dt = time_stage(jax.jit(fn), *args, iters=6)
        print(f"{name:34s} {dt * 1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__}: "
              + " | ".join(str(e).splitlines()[:1]), flush=True)


def main():
    rng = np.random.default_rng(0)
    params = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    params = jax.tree.map(
        lambda x: x.astype(DT)
        if hasattr(x, "astype") and x.dtype == jnp.float32 else x, params)
    sc = params["sc"]
    dec = params["decoder"]

    tokens = jnp.asarray(rng.standard_normal((B, L, LH, LW, HID)), DT)

    t("sc linear only", lambda p, z: linear(
        z, p["embedding"]["w"], p["embedding"]["b"]), sc, tokens)

    def lin_fold(p, z):
        f = linear(z, p["embedding"]["w"], p["embedding"]["b"])
        f = f.reshape(B * L, LH, LW, 7, 7, C)
        return fold(f, (HQ, WQ), (7, 7), (3, 3), (3, 3))

    t("sc linear+fold", lin_fold, sc, tokens)
    t("sc full (linear+fold+bias)", lambda p, z: lin_fold(p, z)
      + p["bias"][None], sc, tokens)

    x0 = jnp.asarray(rng.standard_normal((B * L, HQ, WQ, C)), DT)
    t("dec resize1 (60x108->120x216)", resize_scale2_aligned, x0)
    kinds = [k for k, _, _ in e2fgvi._DEC_PLAN]
    print("dec plan:", e2fgvi._DEC_PLAN, flush=True)
    x1 = jnp.asarray(rng.standard_normal(
        (B * L, 2 * HQ, 2 * WQ, C)), DT)
    t("dec conv1 (128ch @120x216)", lambda p, z: conv2d(
        z, p["w"], p["b"], padding=1), dec[0], x1)
    c2 = dec[1]["w"].shape[2]
    x2 = jnp.asarray(rng.standard_normal(
        (B * L, 2 * HQ, 2 * WQ, c2)), DT)
    t("dec conv2 @120x216", lambda p, z: conv2d(
        z, p["w"], p["b"], padding=1), dec[1], x2)
    c3 = dec[2]["w"].shape[2]
    x3 = jnp.asarray(rng.standard_normal(
        (B * L, 2 * HQ, 2 * WQ, c3)), DT)
    t("dec resize2 (->240x432)", resize_scale2_aligned, x3)
    x4 = jnp.asarray(rng.standard_normal(
        (B * L, 4 * HQ, 4 * WQ, dec[3]["w"].shape[2])), DT)
    t("dec conv4 (->3 @240x432)", lambda p, z: conv2d(
        z, p["w"], p["b"], padding=1), dec[3], x4)


if __name__ == "__main__":
    main()
