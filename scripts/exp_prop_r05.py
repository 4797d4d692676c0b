"""Where does feat_prop's 638 ms/video actually go? (r05)

exp_span_r05 showed the banded sweep is NOT row-bound (span-fast was a
wash) and the 2x128ch warp costs only ~2.7 ms — so the profile's 32
ms/step must hide elsewhere. This times the REAL serving pieces (head
-fused banded DCN, banded warps, the exact step body with its concats)
against the whole bidirectional_propagation at the bench geometry, with
SMOOTH flows (SPyNet-like), bf16, band 24.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_prop_r05.py
"""

import functools
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

from e2fgvi_tpu.models import feat_prop  # noqa: E402
from e2fgvi_tpu.ops.convs import conv2d, leaky_relu  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, T, H, W, C = 14, 11, 60, 108, 128
DT = jnp.bfloat16
BAND = 24


def smooth_field(rng, n, h, w, amp, noise=0.25):
    y = np.linspace(0, 2 * np.pi, h)[None, :, None]
    x = np.linspace(0, 2 * np.pi, w)[None, None, :]
    base = np.stack([np.sin(y * 1.1) * np.cos(x * 0.7),
                     np.cos(y * 0.9) * np.sin(x * 1.3)], axis=-1)
    return (amp * base + rng.standard_normal((n, h, w, 2)) * noise
            ).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    params = jax.tree.map(lambda a: a.astype(DT),
                          feat_prop.init_params(jax.random.PRNGKey(0),
                                                channel=C))
    # non-zero offset head (trained-like): small random last layer
    for d in ("backward", "forward"):
        co = params[d]["deform"]["conv_offset"]
        co[-1]["w"] = (jax.random.normal(jax.random.PRNGKey(7),
                                         co[-1]["w"].shape) * 0.01
                       ).astype(DT)
    p = params["backward"]

    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)), DT)
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)), DT)
    feat2 = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), DT)
    cond = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), DT)
    flow = jnp.asarray(smooth_field(rng, B, H, W, amp=4.0), DT)
    flows = jnp.asarray(np.stack(
        [smooth_field(rng, B, H, W, amp=4.0) for _ in range(T - 1)], 1),
        DT)

    from e2fgvi_tpu.kernels.dcn_band import (
        flow_warp_banded, modulated_deform_conv2d_banded_head)

    @jax.jit
    def warps_step(feat, flow):
        """The step's 3 warps exactly as bidirectional_propagation does
        them: 1 small f2 warp + ONE batched 2x128ch feature warp."""
        f2 = (flow + flow_warp_banded(flow, flow, band=BAND))
        both = flow_warp_banded(jnp.concatenate([feat, feat], 0),
                                jnp.concatenate([flow, f2], 0), band=BAND)
        return both, f2

    @jax.jit
    def offset_head(p, cond, flow):
        z = jnp.concatenate([cond, flow, flow], axis=-1)
        for i, cp in enumerate(p["conv_offset"]):
            z = conv2d(z, cp["w"], cp["b"], padding=1)
            if i < len(p["conv_offset"]) - 1:
                z = leaky_relu(z, 0.1)
        return z

    head = jax.jit(offset_head)(p["deform"], cond, flow)

    @jax.jit
    def dcn_head(x2, head, flow):
        return modulated_deform_conv2d_banded_head(
            x2, head, flow, flow, p["deform"]["w"], p["deform"]["b"],
            band=BAND)

    @jax.jit
    def backbone(feat_cat, prop):
        r = conv2d(feat_cat, p["backbone"][0]["w"], p["backbone"][0]["b"],
                   padding=1)
        r = leaky_relu(r, 0.1)
        r = conv2d(r, p["backbone"][1]["w"], p["backbone"][1]["b"],
                   padding=1)
        return prop + r

    feat_cat = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), DT)

    @jax.jit
    def full_step(feat, feat2, flow):
        """One serving scan-step body (backward direction, banded)."""
        f2 = (flow + flow_warp_banded(flow, flow, band=BAND))
        both = flow_warp_banded(jnp.concatenate([feat, feat], 0),
                                jnp.concatenate([flow, f2], 0), band=BAND)
        cond = jnp.concatenate([both[:B], feat, both[B:]], axis=-1)
        hd = offset_head.__wrapped__(p["deform"], cond, flow)
        stacked = jnp.concatenate([feat, feat], axis=-1)
        aligned, ob = modulated_deform_conv2d_banded_head(
            stacked, hd, flow, f2, p["deform"]["w"], p["deform"]["b"],
            band=BAND)
        cat = jnp.concatenate([feat, aligned], axis=-1)
        return backbone.__wrapped__(cat, aligned), ob

    prop = jax.jit(functools.partial(
        feat_prop.bidirectional_propagation, dcn_band=BAND,
        with_offset_bound=True))

    pieces = [
        ("warps_step (f2 + 2x128ch batched)", warps_step, (feat, flow)),
        ("offset_head (4 convs)", offset_head, (p["deform"], cond, flow)),
        ("dcn_head (banded, head-fused)", dcn_head, (feat2, head, flow)),
        ("backbone (2 convs)", backbone, (feat_cat, feat)),
        ("full_step (serving body)", full_step, (feat, feat2, flow)),
        ("bidirectional_propagation (whole)", prop,
         (params, x, flows, flows)),
    ]
    n_steps = 2 * (T - 1)
    for name, fn, args in pieces:
        dt = time_stage(fn, *args, iters=6)
        per_video = dt * (n_steps if "whole" not in name else 1)
        print(f"{name:36s} {dt * 1e3:8.2f} ms   (x{n_steps} steps = "
              f"{per_video * 1e3:7.1f} ms/video)", flush=True)


if __name__ == "__main__":
    main()
