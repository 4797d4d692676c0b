"""Split the head-fused banded DCN's ~21 ms/step into its three parts:
XLA position prelude (tanh/transposes/bounds), the Pallas band sweep,
and the weight einsum. Directs the next feat_prop optimization (r05).

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_dcnparts_r05.py
"""

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

from e2fgvi_tpu.kernels import dcn_band as bl  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, H, W, C = 14, 60, 108, 128
G, K = 16, 9
CG = 2 * C // G
DT = jnp.bfloat16
BAND = 24
MAXR = 10.0


def smooth_field(rng, n, h, w, amp, noise=0.25):
    y = np.linspace(0, 2 * np.pi, h)[None, :, None]
    x = np.linspace(0, 2 * np.pi, w)[None, None, :]
    base = np.stack([np.sin(y * 1.1) * np.cos(x * 0.7),
                     np.cos(y * 0.9) * np.sin(x * 1.3)], axis=-1)
    return (amp * base + rng.standard_normal((n, h, w, 2)) * noise
            ).astype(np.float32)


def prelude(x, head, flow_1, flow_2):
    """Everything modulated_deform_conv2d_banded_head does BEFORE the
    sampler: positions, mask layout, strip bounds, source pad+pack."""
    n, h, wdt, cin = x.shape
    kh = kw = 3
    k = K
    g = G
    cg = cin // g
    ho, wo = h, wdt
    dy_lo = -(BAND // 2)
    hp = -(-ho // 8) * 8
    nx = -(-(wo + 1) // bl.LANES)
    wp = bl.LANES * nx

    res = (MAXR * jnp.tanh(head[..., : 2 * k * g].astype(jnp.float32)))
    res = res.reshape(n, ho, wo, g, k, 2).transpose(0, 3, 4, 1, 2, 5)
    half = g // 2

    def with_flow(comp):
        f1 = flow_1[..., 1 - comp].astype(jnp.float32)
        f2 = flow_2[..., 1 - comp].astype(jnp.float32)
        fl = jnp.concatenate([
            jnp.broadcast_to(f1[:, None], (n, half, ho, wo)),
            jnp.broadcast_to(f2[:, None], (n, g - half, ho, wo))], axis=1)
        return res[..., comp] + fl[:, :, None]

    off_y = with_flow(0)
    off_x = with_flow(1)
    bound = jnp.abs(off_y).max()
    ky = jnp.repeat(jnp.arange(kh, dtype=jnp.float32), kw)
    kx = jnp.tile(jnp.arange(kw, dtype=jnp.float32), kh)
    base_y = (jnp.arange(ho, dtype=jnp.float32) - 1)[:, None] \
        + jnp.zeros((1, wo), jnp.float32)
    base_x = (jnp.arange(wo, dtype=jnp.float32) - 1)[None, :] \
        + jnp.zeros((ho, 1), jnp.float32)
    py = base_y[None, None, None] + ky[None, None, :, None, None] + off_y
    px = base_x[None, None, None] + kx[None, None, :, None, None] + off_x

    def pos_layout(p):
        p = p.reshape(n * g, k, ho, wo)
        return jnp.pad(p, ((0, 0), (0, 0), (0, hp - ho), (0, wp - wo)),
                       constant_values=-1e4)

    pyg = pos_layout(py)
    pxg = pos_layout(px)
    mask = jax.nn.sigmoid(head[..., 2 * k * g:].astype(jnp.float32))
    mask = mask.reshape(n, ho, wo, g, k).transpose(0, 3, 4, 1, 2)
    mg = pos_layout(mask.astype(x.dtype))

    strips = bl._n_strips(hp)
    sr = hp // strips
    rel = off_y + (ky[None, None, :, None, None] - 1) - dy_lo
    pad5 = ((0, 0), (0, 0), (0, 0), (0, hp - ho), (0, 0))
    rel_min = jnp.pad(rel, pad5, constant_values=1e9).reshape(
        n * g, k, strips, sr, wo).min(axis=(3, 4))
    rel_max = jnp.pad(rel, pad5, constant_values=-1e9).reshape(
        n * g, k, strips, sr, wo).max(axis=(3, 4))
    row_lo = jnp.clip(jnp.floor(rel_min), 0, BAND).astype(jnp.int32)
    row_hi = jnp.clip(jnp.floor(rel_max) + 2, 0, BAND).astype(jnp.int32)
    row_hi = jnp.maximum(row_hi, row_lo)

    xs = x.reshape(n, h, wdt, g, cg).transpose(0, 3, 4, 1, 2)
    xs = xs.reshape(n * g, cg, h, wdt)
    xs = jnp.pad(xs, ((0, 0), (0, 0),
                      (-dy_lo, BAND + dy_lo + hp - h), (0, wp - wdt)))
    xs = bl._pack_pairs(xs)
    return xs, pyg, pxg, mg, row_lo, row_hi, bound


def main():
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), DT)
    head = jnp.asarray(rng.standard_normal((B, H, W, 27 * G)) * 0.1, DT)
    flow = jnp.asarray(smooth_field(rng, B, H, W, 4.0), DT)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 2 * C, C)) * 0.05, DT)
    bias = jnp.zeros((C,), DT)

    pre = jax.jit(prelude)
    xs, pyg, pxg, mg, row_lo, row_hi, _ = pre(x2, head, flow, flow)
    hp = pyg.shape[2]
    strips = bl._n_strips(hp)

    sampler = bl._build_sampler(B * G, K, CG, hp, bl.LANES, BAND,
                                -(BAND // 2), "bfloat16", False,
                                light=False, strips=strips, packed=True,
                                nx=1)

    def sweep(row_lo, row_hi, xs, pyg, pxg, mg):
        return sampler(row_lo, row_hi, xs, pyg, pxg, mg)

    sweep_j = jax.jit(sweep)
    sampled = sweep_j(row_lo, row_hi, xs, pyg, pxg, mg)

    def contract(sampled, wgt, bias):
        s = sampled.reshape(B, G, K, CG, hp, bl.LANES)[..., :H, :W]
        s = s.reshape(B, G * K * CG, H * W).astype(DT)
        wk = wgt.reshape(3, 3, G, CG, C).transpose(2, 0, 1, 3, 4).reshape(
            G * K * CG, C)
        out = jnp.einsum("nip,io->npo", s, wk,
                         preferred_element_type=jnp.float32)
        return (out + bias).reshape(B, H, W, C).astype(DT)

    con_j = jax.jit(contract)
    con_j(sampled, wgt, bias)

    def full(x2, head, flow, wgt, bias):
        return bl.modulated_deform_conv2d_banded_head(
            x2, head, flow, flow, wgt, bias, band=BAND)

    full_j = jax.jit(full)
    full_j(x2, head, flow, wgt, bias)

    for name, fn, args in [
            ("prelude (tanh/pos/bounds/pack)", pre,
             (x2, head, flow, flow)),
            ("pallas sweep", sweep_j, (row_lo, row_hi, xs, pyg, pxg, mg)),
            ("weight einsum", con_j, (sampled, wgt, bias)),
            ("full head-fused dcn", full_j, (x2, head, flow, wgt, bias))]:
        dt = time_stage(fn, *args, iters=6)
        print(f"{name:32s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
