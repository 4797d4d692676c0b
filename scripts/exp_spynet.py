"""Experiment: where do SPyNet's 445 ms/chunk go? (round-2 perf spike)

Times each SPyNet constituent at the flow-chunk geometry (70 images of
64x128 after the mult-of-32 resize) and a few reformulations of the 7x7
convs. Run: PYTHONPATH=. python scripts/exp_spynet.py
"""

import os

import numpy as np

from e2fgvi_tpu.utils import env

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
env.setup()

import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import spynet
from e2fgvi_tpu.ops.convs import conv2d
from e2fgvi_tpu.ops.resize import resize_bilinear, avg_pool_2x2
from e2fgvi_tpu.ops.warp import flow_warp
from e2fgvi_tpu.utils.profiling import time_stage

N, H, W = 70, 64, 128
DT = jnp.bfloat16

rng = np.random.default_rng(0)
params = spynet.init_params(jax.random.PRNGKey(0), dtype=DT)
ref = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)), DT)
supp = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)), DT)
inp8 = jnp.asarray(rng.standard_normal((N, H, W, 8)), DT)
flow = jnp.asarray(rng.standard_normal((N, H, W, 2)), DT)


def t(name, fn, *args, **kw):
    f = jax.jit(fn)
    dt = time_stage(f, *args, iters=8, **kw)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


# full flow at chunk geometry
t("full_spynet_70", lambda p, a, b: spynet.spynet_flow(p, a, b),
  params, ref, supp)

# top-level basic module alone (5 convs 7x7 at 64x128)
t("basic_module_L5", lambda p, x: spynet._basic_module(p["modules"][5], x),
  params, inp8)

# single conv0 7x7 8->32
t("conv0_7x7_8to32",
  lambda p, x: conv2d(x, p["modules"][5]["conv0"]["w"],
                      p["modules"][5]["conv0"]["b"], padding=3),
  params, inp8)

# conv1 7x7 32->64 (the FLOPs-heaviest)
x32 = jnp.asarray(rng.standard_normal((N, H, W, 32)), DT)
t("conv1_7x7_32to64",
  lambda p, x: conv2d(x, p["modules"][5]["conv1"]["w"],
                      p["modules"][5]["conv1"]["b"], padding=3),
  params, x32)

# im2col-by-static-slices + one GEMM for conv1
w1 = params["modules"][5]["conv1"]["w"]


def conv_im2col(x, w, b):
    kh, kw, cin, cout = w.shape
    n, h, ww, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + ww, :]
            for dy in range(kh) for dx in range(kw)]
    patches = jnp.concatenate(cols, axis=-1)
    return patches @ w.reshape(kh * kw * cin, cout) + b


t("conv1_im2col_slices",
  lambda x: conv_im2col(x, w1, params["modules"][5]["conv1"]["b"]), x32)


def basic_module_im2col(mod, x):
    for ci in range(5):
        p = mod[f"conv{ci}"]
        x = conv_im2col(x, p["w"], p["b"])
        if ci < 4:
            x = jax.nn.relu(x)
    return x


t("basic_module_im2col",
  lambda p, x: basic_module_im2col(p["modules"][5], x), params, inp8)

# flow_warp at top level
t("flow_warp_L5", lambda a, f: flow_warp(a, f, padding_mode="border"),
  supp, flow)

# resizes
t("resize_60x108_to_64x128",
  lambda a: resize_bilinear(a, 64, 128, align_corners=False),
  jnp.asarray(rng.uniform(0, 1, (N, 60, 108, 3)), DT))
t("avg_pool_2x2", avg_pool_2x2, ref)


# --- follow-up: per-level basic modules + warps at coarse sizes ----------
for lvl, (h, w) in enumerate([(2, 4), (4, 8), (8, 16), (16, 32), (32, 64),
                              (64, 128)]):
    x = jnp.asarray(rng.standard_normal((N, h, w, 8)), DT)
    t(f"basic_module_L{lvl}_{h}x{w}",
      lambda p, xx, lv=lvl: spynet._basic_module(p["modules"][lv], xx),
      params, x)
for lvl, (h, w) in enumerate([(2, 4), (4, 8), (8, 16), (16, 32), (32, 64)]):
    img = jnp.asarray(rng.uniform(0, 1, (N, h, w, 3)), DT)
    fl = jnp.asarray(rng.standard_normal((N, h, w, 2)), DT)
    t(f"flow_warp_L{lvl}_{h}x{w}",
      lambda a, f: flow_warp(a, f, padding_mode="border"), img, fl)
for lvl, (h, w) in enumerate([(2, 4), (4, 8), (8, 16), (16, 32), (32, 64)]):
    fl = jnp.asarray(rng.standard_normal((N, h, w, 2)), DT)
    t(f"flow_up_L{lvl}_{h}x{w}",
      lambda f, hh=h, ww=w: resize_bilinear(f, 2 * hh, 2 * ww,
                                            align_corners=True) * 2.0, fl)
