"""Banded Pallas sampler for modulated deformable convolution (DCNv2).

Replaces the XLA 2x2-block gather in ops/dcn.py on the hot path. The XLA
gather is row-issue-bound (~40M rows/s measured; DCNv2 needs pixels x 9
taps x 16 groups rows per frame-step — ~85% of the propagation budget,
see results/profile_r02.json). This kernel reformulates the sample as:

- x-axis: Mosaic's lane-dim dynamic gather (out[i,j] = tab[i, idx[i,j]],
  the one dynamic-gather shape this toolchain compiles) — EXACT for
  arbitrary horizontal offsets, the full row fits in the 128-lane vreg;
- y-axis: a static band sweep of row shifts dy in [DY_LO, DY_LO+BAND) with
  bilinear weights relu(1 - |py - (row + dy)|). Zero-padded out-of-image
  rows reproduce mmcv's zeros-outside semantics exactly
  (reference mmcv modulated_deform_conv2d; feat_prop.py:55-58).

Exactness contract: the result equals ops.dcn.modulated_deform_conv2d
whenever every sample's vertical corner rows fall inside the band, i.e.
    floor(py) >= row + DY_LO  and  floor(py) + 1 <= row + DY_LO + BAND - 1
for all samples whose corners are inside the image. The vertical offset is
bounded by |flow_y| + max_residue_magnitude (10, tanh-bounded) + 1 tap,
so `band_for_flow_bound` turns a per-video flow bound into a band; the
caller falls back to the XLA path when the band would exceed `MAX_BAND`
or the feature map is wider than the 128-lane vreg.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_BAND = 80
BAND_BUCKETS = (32, 48, 64, 80)
# |residual| < max_residue_magnitude (feat_prop.py:41-50) and the 3x3 tap
# adds +-1; +2 covers the floor/ceil corners on both sides.
_OFFSET_SLACK = 10 + 1 + 2


def band_for_flow_bound(max_abs_flow_y: float) -> int | None:
    """Smallest band bucket covering |flow_y| <= max_abs_flow_y (in quarter
    -res pixels, AFTER any second-order composition), or None -> XLA path."""
    need = 2 * (math.ceil(max_abs_flow_y) + _OFFSET_SLACK) + 1
    for b in BAND_BUCKETS:
        if b >= need:
            return b
    return None


def _sampler_kernel(src_ref, py_ref, px_ref, m_ref, out_ref, *, band, cg,
                    hp, wp, dy_lo, dtype):
    py = py_ref[0, 0]
    px = px_ref[0, 0]
    x0 = jnp.clip(jnp.floor(px), 0, wp - 2).astype(jnp.int32)
    x0f = x0.astype(jnp.float32)
    wx0 = jax.nn.relu(1.0 - jnp.abs(px - x0f))
    wx1 = jax.nn.relu(1.0 - jnp.abs(px - (x0f + 1.0)))
    # int iota + cast: Mosaic's tpu.iota only produces integer vectors
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(
        jnp.float32)
    # Mosaic's dynamic_gather only lowers for 32-bit lanes: bf16 tables are
    # gathered through an in-register f32 upcast (storage stays bf16)
    gdt = jnp.float32 if dtype == jnp.bfloat16 else dtype
    x1 = x0 + 1
    m = m_ref[0, 0].astype(dtype)

    # fori_loop (not a python loop) over the band, in aligned 8-row blocks:
    # a fully unrolled cg*band loop makes Mosaic's kernel stack grow
    # linearly with the unroll count and blows the 16M scoped-VMEM limit at
    # band >= 48 (measured), while a per-row dynamic slice start can't be
    # proven sublane-aligned — so the loop strides 8 rows (start asserted
    # via pl.multiple_of) and the 8 sub-shifts are static value slices.
    # Band buckets are all multiples of 8.
    def blk_step(bi, accs):
        dif0 = (bi * 8).astype(jnp.float32)
        wps = []
        for r in range(8):
            wy = jax.nn.relu(
                1.0 - jnp.abs(py - (rows + (dy_lo + r) + dif0)))
            wps.append(((wy * wx0).astype(gdt), (wy * wx1).astype(gdt)))
        new = []
        for c in range(cg):
            s_blk = src_ref[0, c,
                            pl.ds(pl.multiple_of(bi * 8, 8), hp + 8),
                            :].astype(gdt)
            acc = accs[c]
            for r in range(8):
                s = s_blk[r: r + hp]
                g0 = jnp.take_along_axis(s, x0, axis=1,
                                         mode="promise_in_bounds")
                g1 = jnp.take_along_axis(s, x1, axis=1,
                                         mode="promise_in_bounds")
                w0, w1 = wps[r]
                acc = acc + g0 * w0 + g1 * w1
            new.append(acc)
        return tuple(new)

    accs = jax.lax.fori_loop(
        0, band // 8, blk_step,
        tuple(jnp.zeros((hp, wp), gdt) for _ in range(cg)))
    for c in range(cg):
        out_ref[0, 0, c] = accs[c].astype(dtype) * m


@functools.lru_cache(maxsize=None)
def _build_sampler(ng, k, cg, hp, wp, band, dy_lo, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name).type
    hs = hp + band
    kern = functools.partial(_sampler_kernel, band=band, cg=cg, hp=hp,
                             wp=wp, dy_lo=dy_lo, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(ng, k),
        in_specs=[
            pl.BlockSpec((1, cg, hs, wp), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cg, hp, wp),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, k, cg, hp, wp), dtype),
        interpret=bool(interpret),
    )


def modulated_deform_conv2d_banded(x, offset, mask, w, b=None, *,
                                   band=32, padding=1, interpret=False):
    """Banded-sampler DCNv2; same contract as ops.dcn.modulated_deform_conv2d
    (stride 1, dilation 1, groups 1), exact under the band contract above.

    Args:
      x: (N, H, W, Cin); offset: (N, Ho, Wo, G, K, 2) (dy, dx) pixels;
      mask: (N, Ho, Wo, G, K) sigmoided; w: (kh, kw, Cin, Cout) HWIO.
      band: static vertical band width (rows).
    """
    n, h, wdt, cin = x.shape
    kh, kw, wcin, cout = w.shape
    g = offset.shape[3]
    k = kh * kw
    cg = cin // g
    ho = h + 2 * padding - kh + 1
    wo = wdt + 2 * padding - kw + 1
    assert (ho, wo) == offset.shape[1:3] and wcin == cin
    assert wo <= LANES - 1, (
        f"banded DCN requires W <= {LANES - 1} lanes, got {wo}")
    dy_lo = -(band // 2)
    hp = -(-ho // 8) * 8
    wp = LANES
    dtype = x.dtype

    off = offset.astype(jnp.float32)
    ky = jnp.repeat(jnp.arange(kh, dtype=jnp.float32), kw)
    kx = jnp.tile(jnp.arange(kw, dtype=jnp.float32), kh)
    base_y = (jnp.arange(ho, dtype=jnp.float32)[:, None] - padding
              + ky[None, :])
    base_x = (jnp.arange(wo, dtype=jnp.float32)[:, None] - padding
              + kx[None, :])
    py = base_y[None, :, None, None, :] + off[..., 0]   # (N,Ho,Wo,G,K)
    px = base_x[None, None, :, None, :] + off[..., 1]

    def pos_layout(p):
        # (N,Ho,Wo,G,K) -> (N*G, K, HP, WP)
        p = p.transpose(0, 3, 4, 1, 2).reshape(n * g, k, ho, wo)
        return jnp.pad(p, ((0, 0), (0, 0), (0, hp - ho), (0, wp - wo)),
                       constant_values=-1e4)

    pyg = pos_layout(py)
    pxg = pos_layout(px)
    mg = pos_layout(mask.astype(jnp.float32))

    # src: (N,H,W,Cin) -> (N*G, CG, HS, WP), rows shifted so padded row r
    # holds real row r + dy_lo (zero outside)
    xs = x.reshape(n, h, wdt, g, cg).transpose(0, 3, 4, 1, 2)
    xs = xs.reshape(n * g, cg, h, wdt)
    xs = jnp.pad(xs, ((0, 0), (0, 0),
                      (-dy_lo, band + dy_lo + hp - h), (0, wp - wdt)))

    sampler = _build_sampler(n * g, k, cg, hp, wp, band, dy_lo,
                             jnp.dtype(dtype).name, interpret)
    sampled = sampler(xs, pyg, pxg, mg)        # (N*G, K, CG, HP, WP)

    # contract in the sampler's native (N, G, K, CG, H, W) layout — a
    # transpose to (N, P, K*Cin) materializes a tensor whose (9, 16) minor
    # dims pad 9.1x under TPU tiling (measured 3.17G/copy at B=14, an HBM
    # OOM); instead flatten (G, K, CG) as the contraction dim and reorder
    # the (small) weight to match
    sampled = sampled.reshape(n, g, k, cg, hp, wp)[..., :ho, :wo]
    sampled = sampled.reshape(n, g * k * cg, ho * wo).astype(dtype)
    wk = w.reshape(kh, kw, g, cg, cout).transpose(2, 0, 1, 3, 4).reshape(
        g * k * cg, cout)
    out = jnp.einsum("nip,io->npo", sampled, wk,
                     preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.reshape(n, ho, wo, cout).astype(dtype)
