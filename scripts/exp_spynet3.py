"""Find + fix the 420ms SPyNet last-level pathology (round-2 spike).

Run: PYTHONPATH=. python scripts/exp_spynet3.py
"""

import os

import numpy as np

from e2fgvi_tpu.utils import env

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
env.setup()

import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import spynet
from e2fgvi_tpu.ops.resize import avg_pool_2x2
from e2fgvi_tpu.utils.profiling import time_stage

N, H, W = 70, 64, 128
DT = jnp.bfloat16

rng = np.random.default_rng(0)
params = spynet.init_params(jax.random.PRNGKey(0), dtype=DT)
ref = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)), DT)
supp = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)), DT)
flow_up = jnp.asarray(rng.standard_normal((N, H, W, 2)), DT)
mean = jnp.asarray(spynet._MEAN)
std = jnp.asarray(spynet._STD)


def t(name, fn, *args):
    dt = time_stage(jax.jit(fn), *args, iters=8)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


# repro candidates: what makes level-5 slow inside the chain?
def norm_cat_module(p, a, b, f):
    inp = jnp.concatenate([(a - mean) / std, (b - mean) / std, f], axis=-1)
    return spynet._basic_module(p["modules"][5], inp)


t("norm_cat_module_L5", norm_cat_module, params, ref, supp, flow_up)


def cat_module(p, a, b, f):
    inp = jnp.concatenate([a, b, f], axis=-1)
    return spynet._basic_module(p["modules"][5], inp)


t("cat_module_L5", cat_module, params, ref, supp, flow_up)


# with the avg_pool pyramid hanging off the same normalized input
# (the real chain computes refs[5] AND its pools; pools feed earlier levels
# whose flow feeds back in — emulate just the fan-out)
def fanout_module(p, a, b, f):
    an = (a - mean) / std
    bn = (b - mean) / std
    pa = avg_pool_2x2(an)
    inp = jnp.concatenate([an, bn, f + pa.mean() * 0], axis=-1)
    return spynet._basic_module(p["modules"][5], inp)


t("fanout_module_L5", fanout_module, params, ref, supp, flow_up)


# fix candidate: pad the 8-ch module input to 16 lanes-friendly channels
def module_pad16(p, a, b, f):
    inp = jnp.concatenate([(a - mean) / std, (b - mean) / std, f], axis=-1)
    inp = jnp.pad(inp, ((0, 0), (0, 0), (0, 0), (0, 8)))
    mod = p["modules"][5]
    w0 = jnp.pad(mod["conv0"]["w"], ((0, 0), (0, 0), (0, 8), (0, 0)))
    x = inp
    from e2fgvi_tpu.ops.convs import conv2d
    x = jax.nn.relu(conv2d(x, w0, mod["conv0"]["b"], padding=3))
    for ci in range(1, 5):
        pp = mod[f"conv{ci}"]
        x = conv2d(x, pp["w"], pp["b"], padding=3)
        if ci < 4:
            x = jax.nn.relu(x)
    return x


t("module_pad16_L5", module_pad16, params, ref, supp, flow_up)


# fix candidate: full chain but last level's flow output returned at 60x108
# (resize inside jit) vs raw
def full_resized(p, a, b):
    fl = spynet._compute_flow(p, (a - 0) * 1.0, b)
    from e2fgvi_tpu.ops.resize import resize_bilinear
    fl = resize_bilinear(fl, 60, 108, align_corners=False)
    return fl * jnp.asarray([108 / 128, 60 / 64], jnp.float32)


t("full_chain_resized_out", full_resized, params, ref, supp)

# fix candidate: split jit — levels 0-4 in one jit, level 5 in another
lowres = jax.jit(lambda p, a, b: _chain_low(p, a, b))


def _chain_low(p, a, b):
    refs = [(a - mean) / std]
    supps = [(b - mean) / std]
    for _ in range(5):
        refs.append(avg_pool_2x2(refs[-1]))
        supps.append(avg_pool_2x2(supps[-1]))
    refs = refs[::-1]
    supps = supps[::-1]
    flow = jnp.zeros((a.shape[0], H // 32, W // 32, 2), a.dtype)
    from e2fgvi_tpu.ops.resize import resize_bilinear
    from e2fgvi_tpu.ops.warp import flow_warp
    for level in range(5):
        if level == 0:
            flow_up2 = flow
        else:
            fh, fw = flow.shape[1], flow.shape[2]
            flow_up2 = resize_bilinear(flow, 2 * fh, 2 * fw,
                                       align_corners=True) * 2.0
        warped = flow_warp(supps[level], flow_up2, padding_mode="border")
        inp = jnp.concatenate([refs[level], warped, flow_up2], axis=-1)
        flow = flow_up2 + spynet._basic_module(p["modules"][level], inp)
    return flow


@jax.jit
def last_level(p, a, b, flow):
    from e2fgvi_tpu.ops.resize import resize_bilinear
    from e2fgvi_tpu.ops.warp import flow_warp
    flow_up2 = resize_bilinear(flow, H, W, align_corners=True) * 2.0
    warped = flow_warp((b - mean) / std, flow_up2, padding_mode="border")
    inp = jnp.concatenate([(a - mean) / std, warped, flow_up2], axis=-1)
    return flow_up2 + spynet._basic_module(p["modules"][5], inp)


def split_jit(p, a, b):
    fl = lowres(p, a, b)
    return last_level(p, a, b, fl)


# time the two-jit composition manually (time_stage handles jitted fns;
# here wrap both calls)
out = split_jit(params, ref, supp)
np.asarray(jnp.sum(out.astype(jnp.float32).ravel()[:1]))
import time
t0 = time.time()
for _ in range(8):
    out = split_jit(params, ref, supp)
np.asarray(jnp.sum(out.astype(jnp.float32).ravel()[:1]))
print(f"split_jit_chain: {(time.time()-t0-0.028)/8*1e3:.2f} ms", flush=True)
