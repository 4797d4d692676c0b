"""Micro-breakdown of one feat_prop scan step at the bench geometry.

feat_prop is the dominant window-stage cost (results/profile_r03.json).
One scan step = 3 flow_warps + the 4-conv offset head + the banded DCN
sampler + 2 backbone convs. This times each piece in isolation (same
shapes, same dtype) to direct the next optimization.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_step_breakdown.py
"""

import os

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.models import feat_prop  # noqa: E402
from e2fgvi_tpu.ops.convs import conv2d, leaky_relu  # noqa: E402
from e2fgvi_tpu.ops.warp import flow_warp  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, H, W, C = 14, 60, 108, 128
DTYPE = jnp.bfloat16
BAND = 24


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda x: x.astype(DTYPE),
        feat_prop.init_params(key, channel=C))
    p = params["backward"]

    feat = jnp.asarray(rng.standard_normal((B, H, W, C)), DTYPE)
    feat2 = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), DTYPE)
    cond = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), DTYPE)
    flow = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 3, DTYPE)

    @jax.jit
    def warp3(feat, flow):
        a = flow_warp(feat, flow)
        f2 = flow + flow_warp(flow, flow)
        b = flow_warp(feat, f2)
        return a, b, f2

    @jax.jit
    def offset_head(p, cond, flow):
        x = jnp.concatenate([cond, flow, flow], axis=-1)
        for i, cp in enumerate(p["conv_offset"]):
            x = conv2d(x, cp["w"], cp["b"], padding=1)
            if i < len(p["conv_offset"]) - 1:
                x = leaky_relu(x, 0.1)
        return feat_prop._offsets_from_head(x, flow, flow)

    offsets, mask = jax.jit(offset_head)(p["deform"], cond, flow)
    offsets = jnp.clip(offsets, -8, 8)

    @jax.jit
    def dcn_banded(x, offsets, mask, w, b):
        from e2fgvi_tpu.kernels.dcn_band import modulated_deform_conv2d_banded
        return modulated_deform_conv2d_banded(x, offsets, mask, w, b,
                                              band=BAND)

    @jax.jit
    def backbone(p, feat_cat, prop):
        r = conv2d(feat_cat, p["backbone"][0]["w"], p["backbone"][0]["b"],
                   padding=1)
        r = leaky_relu(r, 0.1)
        r = conv2d(r, p["backbone"][1]["w"], p["backbone"][1]["b"],
                   padding=1)
        return prop + r

    @jax.jit
    def full_step(p, feat, feat2, flow):
        cond_n1 = flow_warp(feat, flow)
        flow_n2 = flow + flow_warp(flow, flow)
        cond_n2 = flow_warp(feat, flow_n2)
        cond = jnp.concatenate([cond_n1, feat, cond_n2], axis=-1)
        out = offset_head.__wrapped__(p["deform"], cond, flow)
        o, m = out
        o = jnp.clip(o, -8, 8)
        from e2fgvi_tpu.kernels.dcn_band import modulated_deform_conv2d_banded
        aligned = modulated_deform_conv2d_banded(
            feat2, o, m, p["deform"]["w"], p["deform"]["b"], band=BAND)
        cat = jnp.concatenate([feat, aligned], axis=-1)
        return backbone.__wrapped__(p, cat, aligned)

    @jax.jit
    def warp3_banded(feat, flow):
        from e2fgvi_tpu.kernels.dcn_band import flow_warp_banded
        a = flow_warp_banded(feat, flow, band=BAND)
        f2 = flow + flow_warp_banded(flow, flow, band=BAND)
        b = flow_warp_banded(feat, f2, band=BAND)
        return a, b, f2

    @jax.jit
    def dcn_sampler_only(x, offsets, mask):
        """The Pallas sweep alone (sum over taps instead of the weight
        einsum) — splits dcn_banded into kernel vs contraction cost."""
        from e2fgvi_tpu.kernels import dcn_band as bl
        n, h, wdt, cin = x.shape
        g = offsets.shape[3]
        cg = cin // g
        k = offsets.shape[4]
        kh = kw = 3
        ho, wo = h, wdt
        dy_lo = -(BAND // 2)
        hp = -(-ho // 8) * 8
        wp = bl.LANES
        off = offsets.astype(jnp.float32)
        ky = jnp.repeat(jnp.arange(kh, dtype=jnp.float32), kw)
        kx = jnp.tile(jnp.arange(kw, dtype=jnp.float32), kh)
        base_y = (jnp.arange(ho, dtype=jnp.float32)[:, None] - 1 + ky[None])
        base_x = (jnp.arange(wo, dtype=jnp.float32)[:, None] - 1 + kx[None])
        py = base_y[None, :, None, None, :] + off[..., 0]
        px = base_x[None, None, :, None, :] + off[..., 1]

        def pos_layout(pq):
            pq = pq.transpose(0, 3, 4, 1, 2).reshape(n * g, k, ho, wo)
            return jnp.pad(pq, ((0, 0), (0, 0), (0, hp - ho),
                                (0, wp - wo)), constant_values=-1e4)

        pyg, pxg = pos_layout(py), pos_layout(px)
        mg = pos_layout(mask.astype(jnp.float32))
        strips = bl._n_strips(hp)
        sr = hp // strips
        rel = off[..., 0] + (ky[None, None, None, None, :] - 1) - dy_lo
        pad5 = ((0, 0), (0, hp - ho), (0, 0), (0, 0), (0, 0))
        rel_min = jnp.pad(rel, pad5, constant_values=1e9).reshape(
            n, strips, sr, wo, g, k).min(axis=(2, 3))
        rel_max = jnp.pad(rel, pad5, constant_values=-1e9).reshape(
            n, strips, sr, wo, g, k).max(axis=(2, 3))
        row_lo = jnp.clip(jnp.floor(rel_min - 1), 0, BAND).astype(jnp.int32)
        row_hi = jnp.clip(jnp.ceil(rel_max + 1) + 1, 0, BAND).astype(
            jnp.int32)
        row_hi = jnp.maximum(row_hi, row_lo)
        row_lo = row_lo.transpose(0, 2, 3, 1).reshape(n * g, k, strips)
        row_hi = row_hi.transpose(0, 2, 3, 1).reshape(n * g, k, strips)
        xs = x.reshape(n, h, wdt, g, cg).transpose(0, 3, 4, 1, 2)
        xs = xs.reshape(n * g, cg, h, wdt)
        xs = jnp.pad(xs, ((0, 0), (0, 0),
                          (-dy_lo, BAND + dy_lo + hp - h), (0, wp - wdt)))
        sampler = bl._build_sampler(n * g, k, cg, hp, wp, BAND, dy_lo,
                                    jnp.dtype(x.dtype).name, False,
                                    light=False, strips=strips)
        sampled = sampler(row_lo, row_hi, xs, pyg, pxg, mg)
        return sampled.sum(axis=(1, 2))

    feat_cat = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), DTYPE)
    pieces = [
        ("warp3 (2 feat + 1 flow warp)", warp3, (feat, flow)),
        ("warp3_banded (Pallas)", warp3_banded, (feat, flow)),
        ("offset_head (4 convs + split)", offset_head,
         (p["deform"], cond, flow)),
        ("dcn_banded (sampler + einsum)", dcn_banded,
         (feat2, offsets, mask, p["deform"]["w"], p["deform"]["b"])),
        ("dcn_sampler_only (tap-sum)", dcn_sampler_only,
         (feat2, offsets, mask)),
        ("backbone (2 convs)", backbone, (p, feat_cat, feat)),
        ("full_step", full_step, (p, feat, feat2, flow)),
    ]
    for name, fn, args in pieces:
        dt = time_stage(fn, *args, iters=8)
        print(f"{name:34s} {dt * 1e3:7.2f} ms  (x32 steps = "
              f"{dt * 32:6.3f} s/video)", flush=True)


if __name__ == "__main__":
    main()
