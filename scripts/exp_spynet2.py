"""Bisect why chained SPyNet is 10x slower than its parts (round-2 spike).

Run: PYTHONPATH=. python scripts/exp_spynet2.py
"""

import os

import numpy as np

from e2fgvi_tpu.utils import env

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
env.setup()

import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import spynet
from e2fgvi_tpu.ops.resize import resize_bilinear, avg_pool_2x2
from e2fgvi_tpu.ops.warp import flow_warp
from e2fgvi_tpu.utils.profiling import time_stage

N, H, W = 70, 64, 128
DT = jnp.bfloat16

rng = np.random.default_rng(0)
params = spynet.init_params(jax.random.PRNGKey(0), dtype=DT)
ref = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)), DT)
supp = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)), DT)


def t(name, fn, *args):
    dt = time_stage(jax.jit(fn), *args, iters=8)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


def compute_flow_variant(params, ref, supp, warp=True, up="resize",
                         levels=6):
    n = ref.shape[0]
    mean = jnp.asarray(spynet._MEAN)
    std = jnp.asarray(spynet._STD)
    refs = [(ref - mean) / std]
    supps = [(supp - mean) / std]
    for _ in range(5):
        refs.append(avg_pool_2x2(refs[-1]))
        supps.append(avg_pool_2x2(supps[-1]))
    refs = refs[::-1]
    supps = supps[::-1]

    flow = jnp.zeros((n, H // 32, W // 32, 2), ref.dtype)
    for level in range(levels):
        if level == 0:
            flow_up = flow
        else:
            fh, fw = flow.shape[1], flow.shape[2]
            if up == "resize":
                flow_up = resize_bilinear(flow, 2 * fh, 2 * fw,
                                          align_corners=True) * 2.0
            else:
                flow_up = jnp.repeat(jnp.repeat(flow, 2, axis=1), 2,
                                     axis=2) * 2.0
        if warp:
            warped = flow_warp(supps[level], flow_up,
                               padding_mode="border")
        else:
            warped = supps[level]
        inp = jnp.concatenate([refs[level], warped, flow_up], axis=-1)
        flow = flow_up + spynet._basic_module(params["modules"][level], inp)
    return flow


t("full_chain", compute_flow_variant, params, ref, supp)
t("no_warp", lambda p, a, b: compute_flow_variant(p, a, b, warp=False),
  params, ref, supp)
t("repeat_up", lambda p, a, b: compute_flow_variant(p, a, b, up="repeat"),
  params, ref, supp)
t("no_warp_repeat_up",
  lambda p, a, b: compute_flow_variant(p, a, b, warp=False, up="repeat"),
  params, ref, supp)
for lv in (1, 2, 3, 4, 5):
    t(f"chain_levels_{lv}",
      lambda p, a, b, L=lv: compute_flow_variant(p, a, b, levels=L),
      params, ref, supp)
