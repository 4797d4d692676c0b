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
caller falls back to the XLA path when the band would exceed `MAX_BAND`.
Maps wider than one 128-lane vreg (HQ/720p quarter-res) run a multi-tile
gather: nx^2 range-selected 128-lane gathers per access (see
_sampler_kernel.gather_x), exact for arbitrary horizontal offsets.

Why the 3x3 weight contraction stays OUTSIDE the kernel (in XLA): sampling
must run in a (rows=sublanes, x=lanes) layout — the lane-dim dynamic
gather and the banded row sweep both require it — while an MXU matmul
over the (group, tap, channel) contraction dim needs the pixel axis
flattened to (H*W, K*CG), i.e. a sublane+lane-merging relayout that
Mosaic cannot express as a no-op (it redistributes every (8, 128) tile).
Doing the contraction as in-layout plane-FMAs instead would put
G*K*CG*Cout plane combinations on the VPU (~27 GFMA per propagation
step — two orders over the einsum's MXU cost). So the kernel writes
sampled taps in the contraction-ready (N, G*K*CG, Ho*Wo) flattening
(no XLA relayout on read — measured: the transposed alternative
materializes a 9.1x-padded 3.17 GB copy) and one XLA einsum applies the
reordered weight; its HBM round-trip is ~0.4 GB/step at full batch,
~1.5 ms of the ~40 ms step. The kernel's own band sweep is where the
time goes, which the per-strip row bounds attack directly.

Sweep-tightening is tapped out (measured r05): a span-fast variant that
swept exactly [lo, lo+span) rows from a dynamic-start slab when a
strip's measured span fit (instead of the block path's 8-16 gated rows)
was a WASH on smooth SPyNet-like offsets — dcn 17.87 -> 17.75 ms, warps
slightly worse (scripts/exp_span_r05.py, reverted). With the strip
bounds already skipping most blocks, the remaining time is the
per-sample gather+FMA floor (~2 corner rows x pixels x taps x groups x
channels) plus span-independent fixed work — not sweep width.
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
BAND_BUCKETS = (16, 24, 32, 48, 64, 80)
# |residual| < max_residue_magnitude (feat_prop.py:41-50) and the 3x3 tap
# adds +-1; +2 covers the floor/ceil corners on both sides.
_OFFSET_SLACK = 10 + 1 + 2
# tap +-1 and floor/ceil corners +-2 — the slack that remains once the
# actual offset magnitude (flow + tanh residual) has been measured
_TAP_CORNER_SLACK = 1 + 2
# Assumed residual magnitude for the optimistic first dispatch. The
# offset head's residual is tanh-bounded at 10 (feat_prop.py), but
# trained heads keep offsets near the guiding flow, so a much smaller
# margin suffices in practice. Grounding (pipeline.last_band_stats over
# the tennis bench at serving weights): measured offset_bound exceeds the
# measured flow_bound by ~1-2 px, so 4.0 leaves >2 px of headroom and
# re-dispatches were never observed (bench reports `band_redispatches`).
# A violated margin is caught by the in-forward measured bound and costs
# one exact re-dispatch (~40 s compile for an unseen band bucket, free
# for a cached one) — never wrong output. Tunable per deployment via
# E2FGVI_DCN_RESIDUAL until a released checkpoint allows a definitive
# measurement.
import os as _os

RESIDUAL_MARGIN = float(_os.environ.get("E2FGVI_DCN_RESIDUAL", "4.0"))

# Register-accumulation sweep (r05): accumulate each strip's slab in
# vregs carried through lax.cond instead of a VMEM (cg, hp, wp) scratch.
# The scratch's fixed traffic — zero-init, one read-modify-write per
# triggered block, and the final read-multiply-write — is the measured
# span-independent floor the span-fast A/B exposed (exp_span_r05 was a
# wash; exp_dcnparts_r05: sweep 16.4 ms of the 21.2 ms step). pl.when
# cannot carry values out of its region, so block skipping moves to
# lax.cond over the per-strip accumulator pytree. Measured on-chip
# (exp_regacc_r05, serving geometry, smooth flows): warp128 2.34 ->
# 0.32 ms (the warp's cost was almost entirely scratch traffic — most
# strips trigger zero blocks but the scratch form still paid the full
# init + final pass); head-fused DCN 20.4 -> 19.9 ms at blk_rows=4 (the
# DCN sweep is at its per-row gather+FMA floor, ~6 cycles per (8,128)
# row slab, so scratch removal only trims the margins). Bit-exact vs
# the scratch sweep in the same run.
REGACC = _os.environ.get("E2FGVI_DCN_REGACC", "1") != "0"

# Row granularity of the per-strip skip bounds (the sweep work scales with
# the offsets' vertical span within a strip, not the whole image — see
# _sampler_kernel). 0 disables strips (whole-tile bounds, the pre-strip
# behavior) for A/B benching.
STRIP_ROWS = int(_os.environ.get("E2FGVI_BAND_STRIP_ROWS", "8"))

# Gated-block row granularity of the regacc sweep. The scratch sweep is
# pinned at 8 (per-block VMEM RMW made finer blocks a loss); with the
# accumulator in registers a triggered block's cost is pure gather+FMA
# rows, so finer blocks trade extra scalar branches for fewer wasted
# rows when the strip's span is small. Must divide the band buckets.
# Measured (exp_regacc_r05): 4 beats 8 (19.88 vs 20.76 ms head-fused
# DCN); 2 loses (22.84 — the lax.cond's carried-vreg overhead per gated
# block overtakes the saved rows).
BLK_ROWS = int(_os.environ.get("E2FGVI_DCN_BLKROWS", "4"))


def _n_strips(hp: int) -> int:
    if STRIP_ROWS <= 0 or hp % STRIP_ROWS:
        return 1
    return hp // STRIP_ROWS


def band_for_flow_bound(max_abs_flow_y: float) -> int | None:
    """Smallest band bucket covering |flow_y| <= max_abs_flow_y (in quarter
    -res pixels, AFTER any second-order composition) plus the worst-case
    tanh residual, or None -> XLA path."""
    need = 2 * (math.ceil(max_abs_flow_y) + _OFFSET_SLACK) + 1
    for b in BAND_BUCKETS:
        if b >= need:
            return b
    return None


def band_for_offset_bound(max_abs_off_y: float) -> int | None:
    """Smallest band bucket exact for a MEASURED vertical offset bound
    (|flow_y + residual_y| as computed by the offset head)."""
    need = 2 * (math.ceil(max_abs_off_y) + _TAP_CORNER_SLACK) + 1
    for b in BAND_BUCKETS:
        if b >= need:
            return b
    return None


def band_for_warp_bound(max_abs_flow_y: float) -> int | None:
    """Smallest band bucket exact for `flow_warp_banded` at a MEASURED
    |flow_y| bound (K=1: corners only, no tap extent, no residual)."""
    need = 2 * (math.ceil(max_abs_flow_y) + 2) + 1
    for b in BAND_BUCKETS:
        if b >= need:
            return b
    return None


def _sampler_kernel(lo_ref, hi_ref, src_ref, py_ref, px_ref, m_ref,
                    out_ref, acc_ref=None, *, band, cg, hp, wp, dy_lo,
                    dtype, dynamic_bounds, strips=1, k=1, packed=False,
                    nx=1, regacc=False, blk_rows=8):
    py = py_ref[0, 0]
    px = px_ref[0, 0]
    x0 = jnp.clip(jnp.floor(px), 0, nx * wp - 2).astype(jnp.int32)
    x0f = x0.astype(jnp.float32)
    wx0 = jax.nn.relu(1.0 - jnp.abs(px - x0f))
    wx1 = jax.nn.relu(1.0 - jnp.abs(px - (x0f + 1.0)))
    # int iota + cast: Mosaic's tpu.iota only produces integer vectors
    wpx = nx * wp
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wpx), 0).astype(
        jnp.float32)
    # Mosaic's dynamic_gather only lowers for 32-bit lanes: bf16 tables are
    # gathered through an in-register f32 upcast (storage stays bf16)
    gdt = jnp.float32 if dtype == jnp.bfloat16 else dtype
    x1 = x0 + 1
    m = m_ref[0, 0].astype(dtype)

    def gather_x(sm, idx):
        """Lane gather across nx 128-lane tiles. nx == 1 is Mosaic's
        native lane-dim dynamic gather; wider maps decompose into the
        same proven (rows, 128) gather per (output-tile, source-tile)
        pair, range-selected — indices stay in [0, wp) per gather, so
        each lowers exactly like the nx == 1 op."""
        if nx == 1:
            return jnp.take_along_axis(sm, idx, axis=1,
                                       mode="promise_in_bounds")
        cols = []
        for o in range(nx):
            io = idx[:, o * wp: (o + 1) * wp]
            acc_o = None
            for j in range(nx):
                rel = io - j * wp
                gj = jnp.take_along_axis(
                    sm[:, j * wp: (j + 1) * wp],
                    jnp.clip(rel, 0, wp - 1), axis=1,
                    mode="promise_in_bounds")
                hit = (rel >= 0) & (rel < wp)
                acc_o = (jnp.where(hit, gj, jnp.zeros_like(gj))
                         if acc_o is None else jnp.where(hit, gj, acc_o))
            cols.append(acc_o)
        return jnp.concatenate(cols, axis=1)

    # STATIC unroll over the band's 8-row blocks with pl.when skipping —
    # a fori_loop with pl.ds-sliced source measures 1.7x slower (dynamic
    # VMEM slicing forces copies; static slices index registers directly).
    # Per-block accumulation stays in registers; blocks += into a VMEM
    # scratch so skipped blocks cost nothing. The needed block range per
    # (batch*group, tap) tile follows from the tile's measured vertical
    # offsets (computed in XLA, delivered as SMEM scalars); rows outside
    # contribute exactly zero weight, so skipping them is exact. Typical
    # trained offsets need ~2 of the band's 2-10 blocks.
    #
    # strips > 1 tightens the skip further: bounds are measured per
    # output-row strip (offsets vary smoothly across the image, so a
    # strip's vertical span is far smaller than the whole tile's), and
    # the band sweep runs per strip on (hp/strips, wp) sub-tiles.
    # strips == 1 reproduces the whole-tile behavior exactly.
    if dynamic_bounds:
        # the bounds ride as a FLAT 1-D SMEM array indexed by one computed
        # scalar: a 3-D lo_ref[i, t, s] load with multiple dynamic indices
        # crashes the TPU compile helper (tpu_compile_helper exit 1,
        # observed 2026-08-18 on libtpu behind the axon terminal; the same
        # kernel compiled fine with a single dynamic index) — flat
        # indexing is equivalent and sidesteps the lowering bug
        i = pl.program_id(0)
        t = pl.program_id(1)
        flat = (i * k + t) * strips
    sh = hp // strips

    def tap_rows(sm, x0_s, x1_s, w0, w1):
        """One band row's contribution on a strip slab: gather both
        bilinear-x corners and apply their weights."""
        if packed:
            # int32 lanes pack (bf16 src[y,x] << 16 | bf16 src[y,x+1]):
            # ONE gather per (c, row), unpacked by two bit-ops — the f32
            # values and FMA order are identical to the two-gather form
            # (bf16 -> f32 upcast is a pure bit shift), so the result is
            # bit-exact (A/B: 34.1 -> 28.9 ms on the full-sweep tile,
            # exp_dcn_inner_r04)
            gth = gather_x(sm, x0_s)
            g0 = jax.lax.bitcast_convert_type(
                gth & jnp.int32(-65536), jnp.float32)
            g1 = jax.lax.bitcast_convert_type(gth << 16, jnp.float32)
        else:
            sm = sm.astype(gdt)
            g0 = gather_x(sm, x0_s)
            g1 = gather_x(sm, x1_s)
        return g0 * w0 + g1 * w1

    if not regacc:
        for c in range(cg):
            acc_ref[c] = jnp.zeros((hp, wpx), gdt)

    for s in range(strips):
        r0, r1 = s * sh, (s + 1) * sh
        if strips > 1:
            py_s, x0_s, x1_s = py[r0:r1], x0[r0:r1], x1[r0:r1]
            wx0_s, wx1_s = wx0[r0:r1], wx1[r0:r1]
            rows_s = rows[r0:r1]
        else:
            py_s, x0_s, x1_s = py, x0, x1
            wx0_s, wx1_s = wx0, wx1
            rows_s = rows
        br = blk_rows if regacc else 8

        if dynamic_bounds:
            lo_blk = lo_ref[flat + s] // br
            hi_blk = (hi_ref[flat + s] + (br - 1)) // br

        def blk_weights(bi):
            base = float(dy_lo + bi * br)
            wps = []
            for r in range(br):
                wy = jax.nn.relu(
                    1.0 - jnp.abs(py_s - (rows_s + (base + r))))
                wps.append(((wy * wx0_s).astype(gdt),
                            (wy * wx1_s).astype(gdt)))
            return wps

        if regacc:
            # Register-accumulation sweep: the strip's (cg, sh, wpx)
            # accumulator rides as vregs carried through lax.cond — no
            # VMEM scratch init/RMW/final-pass, the output slab is
            # written exactly once per strip. Skipped blocks cost one
            # scalar branch. Zero-weight rows contribute nothing, so the
            # skip is exact (same argument as the pl.when form).
            accs = [jnp.zeros((sh, wpx), gdt) for _ in range(cg)]
            for bi in range(band // br):

                def blk_add(accs, bi=bi, x0_s=x0_s, x1_s=x1_s, r0=r0):
                    wps = blk_weights(bi)
                    new = []
                    for c in range(cg):
                        acc = accs[c]
                        for r in range(br):
                            sm = src_ref[0, c, r0 + bi * br + r:
                                         r0 + bi * br + r + sh, :]
                            w0, w1 = wps[r]
                            acc = acc + tap_rows(sm, x0_s, x1_s, w0, w1)
                        new.append(acc)
                    return new

                if dynamic_bounds:
                    accs = jax.lax.cond(
                        (bi >= lo_blk) & (bi < hi_blk), blk_add,
                        lambda a: a, accs)
                else:
                    accs = blk_add(accs)
            m_s = m[r0:r1] if strips > 1 else m
            for c in range(cg):
                out_ref[0, 0, c, r0:r1, :] = accs[c].astype(dtype) * m_s
            continue

        # 8-row BLOCK granularity for the pl.when skip: per-block
        # accumulation stays in registers (one VMEM read-modify-write of
        # the strip slab per block). A row-granular pl.when was A/B'd and
        # LOST (21.6 -> 41.8 ms full dcn_banded, exp_step_breakdown
        # 2026-08-19): values cannot escape a pl.when region, so per-row
        # predication forces a per-row VMEM RMW that costs twice what the
        # skipped rows save.
        for bi in range(band // 8):

            def blk(bi=bi, x0_s=x0_s, x1_s=x1_s, r0=r0, r1=r1):
                wps = blk_weights(bi)
                for c in range(cg):
                    acc = acc_ref[c, r0:r1]
                    for r in range(8):
                        sm = src_ref[0, c, r0 + bi * 8 + r:
                                     r0 + bi * 8 + r + (r1 - r0), :]
                        w0, w1 = wps[r]
                        acc = acc + tap_rows(sm, x0_s, x1_s, w0, w1)
                    acc_ref[c, r0:r1] = acc

            if dynamic_bounds:
                pl.when((bi >= lo_blk) & (bi < hi_blk))(blk)
            else:
                blk()

    if not regacc:
        for c in range(cg):
            out_ref[0, 0, c] = acc_ref[c].astype(dtype) * m


def _pack_pairs(xs):
    """(..., W) bf16 -> int32 lanes packing (bf16 xs[..., x] << 16 |
    bf16 xs[..., x+1]) with a zero column appended — the packed-gather
    kernel's source format (one lane gather yields both bilinear-x
    corners; bf16 -> f32 upcast is a pure bit shift, so unpacking
    reproduces the two-gather arithmetic bit-exactly)."""
    u = jax.lax.bitcast_convert_type(xs, jnp.uint16).astype(jnp.int32)
    nxt = jnp.concatenate([u[..., 1:], jnp.zeros_like(u[..., :1])], -1)
    return (u << 16) | nxt


@functools.lru_cache(maxsize=None)
def _build_sampler(ng, k, cg, hp, wp, band, dy_lo, dtype_name, interpret,
                   light=False, strips=1, packed=False, nx=1,
                   regacc=False, blk_rows=8):
    dtype = jnp.dtype(dtype_name).type
    hs = hp + band
    if band % blk_rows:
        blk_rows = 8
    kern = functools.partial(_sampler_kernel, band=band, cg=cg, hp=hp,
                             wp=wp, dy_lo=dy_lo, dtype=dtype,
                             dynamic_bounds=not light,
                             strips=strips if not light else 1, k=k,
                             packed=packed, nx=nx, regacc=regacc,
                             blk_rows=blk_rows)
    wp = wp * nx   # total lane width of every block below
    gdt = jnp.float32 if dtype == jnp.bfloat16 else dtype
    scratch = [] if regacc else [pltpu.VMEM((cg, hp, wp), gdt)]
    if light:
        # full-band sweep, no scalar args — for interpret mode and CPU
        # backends (the interpreter is pathologically slow on dynamic trip
        # counts and scalar-prefetch grid specs)
        def kern_i(src_ref, py_ref, px_ref, m_ref, out_ref, *acc_ref):
            kern(None, None, src_ref, py_ref, px_ref, m_ref, out_ref,
                 *acc_ref)

        return pl.pallas_call(
            kern_i,
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
            scratch_shapes=scratch,
            interpret=bool(interpret),
        )

    # TPU: per-(batch*group, tap, strip) row bounds ride as scalar-prefetch
    # args (SMEM), FLATTENED to 1-D and indexed by one computed scalar
    # in-kernel (see _sampler_kernel: multi-dynamic-index SMEM loads crash
    # the compile helper)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ng, k),
            in_specs=[
                pl.BlockSpec((1, cg, hs, wp), lambda i, t, lo, hi:
                             (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, hp, wp), lambda i, t, lo, hi:
                             (i, t, 0, 0)),
                pl.BlockSpec((1, 1, hp, wp), lambda i, t, lo, hi:
                             (i, t, 0, 0)),
                pl.BlockSpec((1, 1, hp, wp), lambda i, t, lo, hi:
                             (i, t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, cg, hp, wp),
                                   lambda i, t, lo, hi: (i, t, 0, 0, 0)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((ng, k, cg, hp, wp), dtype),
        interpret=bool(interpret),
    )

    def dispatch(lo, hi, xs, pyg, pxg, mg):
        return call(lo.reshape(-1), hi.reshape(-1), xs, pyg, pxg, mg)

    return dispatch


def flow_warp_banded(x, flow, *, band=32, interpret=False, light=None):
    """Banded Pallas flow_warp — same contract as ops.warp.flow_warp
    (align_corners bilinear, zeros padding; reference flow_comp.py:345-383)
    whenever |flow_y| respects the band contract (module docstring with
    K=1, no tap extent). flow_warp is a K=1, G=1 special case of the DCN
    sampler, so it reuses `_build_sampler` verbatim with channels tiled
    across the "group" axis (<=64 per tile to respect VMEM) and no
    weight contraction.

    Motivation: XLA lowers the bilinear gather to a row-issue-bound
    gather (~40M rows/s); the two 128-channel feature warps per
    propagation step issue ~726k rows — the dominant cost of feat_prop
    (results/profile_r03.json). The banded kernel streams rows instead.

    x: (N, H, W, C); flow: (N, H, W, 2), last dim (dx, dy) in pixels.
    """
    n, h, w, c = x.shape
    cg = math.gcd(c, 64)
    g = c // cg
    dy_lo = -(band // 2)
    hp = -(-h // 8) * 8
    # maps wider than one 128-lane vreg run the multi-tile gather
    # (nx^2 range-selected 128-lane gathers — see _sampler_kernel);
    # +1 keeps a zero pad column after the last real x
    nx = -(-(w + 1) // LANES)
    wp = LANES * nx
    dtype = x.dtype

    fl = flow.astype(jnp.float32)
    py = jnp.arange(h, dtype=jnp.float32)[None, :, None] + fl[..., 1]
    px = jnp.arange(w, dtype=jnp.float32)[None, None, :] + fl[..., 0]

    def pos_layout(p):
        # (N, H, W) -> (N*G, 1, HP, WP); all channel tiles of an image
        # share its positions
        p = jnp.pad(p, ((0, 0), (0, hp - h), (0, wp - w)),
                    constant_values=-1e4)
        return jnp.broadcast_to(p[:, None, None], (n, g, 1, hp, wp)
                                ).reshape(n * g, 1, hp, wp)

    pyg = pos_layout(py)
    pxg = pos_layout(px)
    ones = jnp.ones((n * g, 1, hp, wp), jnp.float32)

    # per-(image, 8-row strip) needed row range (rel = py - row =
    # flow_y - dy_lo); padded strips get lo == hi == band -> swept nothing
    strips = _n_strips(hp)
    sr = hp // strips
    rel = fl[..., 1] - dy_lo                                  # (N, H, W)
    relp_min = jnp.pad(rel, ((0, 0), (0, hp - h), (0, 0)),
                       constant_values=1e9)
    relp_max = jnp.pad(rel, ((0, 0), (0, hp - h), (0, 0)),
                       constant_values=-1e9)
    rel_min = relp_min.reshape(n, strips, sr, w).min(axis=(2, 3))  # (N, S)
    rel_max = relp_max.reshape(n, strips, sr, w).max(axis=(2, 3))
    # exact corner bounds: a band row r contributes iff |py - r| < 1 for
    # some sample, and the needed rows of sample py are exactly floor(py)
    # (weight 1-frac, or 1 when py is integral) and floor(py)+1 (weight
    # frac, harmlessly 0 when integral) — so [floor(min), floor(max)+2)
    # covers every contributing row with zero slack
    row_lo = jnp.clip(jnp.floor(rel_min), 0, band).astype(jnp.int32)
    row_hi = jnp.clip(jnp.floor(rel_max) + 2, 0, band).astype(jnp.int32)
    row_hi = jnp.maximum(row_hi, row_lo)
    row_lo = jnp.broadcast_to(row_lo[:, None, None, :],
                              (n, g, 1, strips)).reshape(n * g, 1, strips)
    row_hi = jnp.broadcast_to(row_hi[:, None, None, :],
                              (n, g, 1, strips)).reshape(n * g, 1, strips)

    xs = x.reshape(n, h, w, g, cg).transpose(0, 3, 4, 1, 2)
    xs = xs.reshape(n * g, cg, h, w)
    xs = jnp.pad(xs, ((0, 0), (0, 0),
                      (-dy_lo, band + dy_lo + hp - h), (0, wp - w)))

    if light is None:
        light = bool(interpret) or jax.default_backend() == "cpu"
    packed = dtype == jnp.bfloat16
    if packed:
        xs = _pack_pairs(xs)
    sampler = _build_sampler(n * g, 1, cg, hp, LANES, band, dy_lo,
                             jnp.dtype(dtype).name, bool(interpret),
                             light=light, strips=strips, packed=packed,
                             nx=nx, regacc=REGACC, blk_rows=BLK_ROWS)
    if light:
        sampled = sampler(xs, pyg, pxg, ones)
    else:
        sampled = sampler(row_lo, row_hi, xs, pyg, pxg, ones)
    # (N*G, 1, CG, HP, WP) -> (N, H, W, C)
    sampled = sampled.reshape(n, g, cg, hp, wp)[..., :h, :w]
    return sampled.transpose(0, 3, 4, 1, 2).reshape(n, h, w, c)


def _sample_and_contract(x, pyg, pxg, mg, row_lo, row_hi, w, b, *,
                         n, g, k, cg, ho, wo, hp, wp, band, dy_lo,
                         interpret, light, nx=1):
    """Shared tail of the banded DCNv2 variants: pad/pack the source,
    run the Pallas sweep, contract with the (reordered) conv weight."""
    kh, kw = w.shape[0], w.shape[1]
    cout = w.shape[3]
    h, wdt = x.shape[1], x.shape[2]
    dtype = x.dtype
    # src: (N,H,W,Cin) -> (N*G, CG, HS, WP), rows shifted so padded row r
    # holds real row r + dy_lo (zero outside)
    xs = x.reshape(n, h, wdt, g, cg).transpose(0, 3, 4, 1, 2)
    xs = xs.reshape(n * g, cg, h, wdt)
    xs = jnp.pad(xs, ((0, 0), (0, 0),
                      (-dy_lo, band + dy_lo + hp - h), (0, wp - wdt)))

    # the static full-sweep variant also serves CPU backends (e.g. tests
    # under force_tpu_interpret_mode): the interpreter is pathologically
    # slow on dynamic trip counts and scalar-prefetch grids
    if light is None:
        light = bool(interpret) or jax.default_backend() == "cpu"
    packed = dtype == jnp.bfloat16
    if packed:
        xs = _pack_pairs(xs)
    sampler = _build_sampler(n * g, k, cg, hp, LANES, band, dy_lo,
                             jnp.dtype(dtype).name, bool(interpret),
                             light=light, strips=_n_strips(hp),
                             packed=packed, nx=nx, regacc=REGACC,
                             blk_rows=BLK_ROWS)
    if light:
        sampled = sampler(xs, pyg, pxg, mg)
    else:
        sampled = sampler(row_lo, row_hi, xs, pyg, pxg, mg)
    # -> (N*G, K, CG, HP, WP)

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


def modulated_deform_conv2d_banded(x, offset, mask, w, b=None, *,
                                   band=32, padding=1, interpret=False,
                                   light=None):
    """Banded-sampler DCNv2; same contract as ops.dcn.modulated_deform_conv2d
    (stride 1, dilation 1, groups 1), exact under the band contract above.

    Args:
      x: (N, H, W, Cin); offset: (N, Ho, Wo, G, K, 2) (dy, dx) pixels;
      mask: (N, Ho, Wo, G, K) sigmoided; w: (kh, kw, Cin, Cout) HWIO.
      band: static vertical band width (rows).
      light: None -> auto (full-sweep variant on CPU/interpret, scalar
        -prefetch block skipping on TPU); tests pass False+interpret to
        exercise the production bounds math off-TPU.
    """
    n, h, wdt, cin = x.shape
    kh, kw, wcin, cout = w.shape
    g = offset.shape[3]
    k = kh * kw
    cg = cin // g
    ho = h + 2 * padding - kh + 1
    wo = wdt + 2 * padding - kw + 1
    assert (ho, wo) == offset.shape[1:3] and wcin == cin
    dy_lo = -(band // 2)
    hp = -(-ho // 8) * 8
    nx = -(-(wo + 1) // LANES)   # lane tiles (multi-tile gather for wide maps)
    wp = LANES * nx
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

    # per-(N*G, K, strip) needed row range: a band row di contributes iff
    # |py - (row + dy_lo + di)| < 1, and py - row = (ky - padding) + off_y
    # — so the range follows from the strip's offset extrema (computed
    # BEFORE pos_layout's -1e4 padding, which would pin the minimum;
    # padded strips get lo == hi == band -> swept nothing)
    strips = _n_strips(hp)
    sr = hp // strips
    rel = off[..., 0] + (ky[None, None, None, None, :] - padding) - dy_lo
    pad5 = ((0, 0), (0, hp - ho), (0, 0), (0, 0), (0, 0))
    relp_min = jnp.pad(rel, pad5, constant_values=1e9)
    relp_max = jnp.pad(rel, pad5, constant_values=-1e9)
    rel_min = relp_min.reshape(n, strips, sr, wo, g, k).min(axis=(2, 3))
    rel_max = relp_max.reshape(n, strips, sr, wo, g, k).max(axis=(2, 3))
    # exact corner bounds — see flow_warp_banded above for the derivation
    row_lo = jnp.clip(jnp.floor(rel_min), 0, band).astype(jnp.int32)
    row_hi = jnp.clip(jnp.floor(rel_max) + 2, 0, band).astype(jnp.int32)
    row_hi = jnp.maximum(row_hi, row_lo)                # (N, S, G, K)
    row_lo = row_lo.transpose(0, 2, 3, 1).reshape(n * g, k, strips)
    row_hi = row_hi.transpose(0, 2, 3, 1).reshape(n * g, k, strips)

    return _sample_and_contract(
        x, pyg, pxg, mg, row_lo, row_hi, w, b, n=n, g=g, k=k, cg=cg,
        ho=ho, wo=wo, hp=hp, wp=wp, band=band, dy_lo=dy_lo,
        interpret=interpret, light=light, nx=nx)


def modulated_deform_conv2d_banded_head(x, head, flow_1, flow_2, w, b=None,
                                        *, band=32, padding=1,
                                        max_residue=10.0, interpret=False,
                                        light=None):
    """Banded DCNv2 with the offset head FUSED into the position prelude.

    Numerically identical to
        offsets, mask = feat_prop._offsets_from_head(head, flow_1, flow_2)
        modulated_deform_conv2d_banded(x, offsets, mask, w, b, band=band)
    (same f32 add order res+flow then +base; the mask rides as bf16, which
    the sampler kernel cast it to anyway), but never materializes the
    (N,Ho,Wo,G,K,{2|1}) offset/mask tensors: producing them only to
    transpose into the kernel's (N*G, K, HP, WP) layout measured
    6.3 + 3.5 ms/step of the propagation budget (exp_offsets_r04) — here
    tanh/sigmoid/flow-add fuse straight into the single transposing pass,
    and the per-strip row bounds reduce from the same values.

    head: (N, Ho, Wo, 3*K*G) raw offset-head output, channel c of the
    offset part = (g*K + tap)*2 + {dy,dx} and the mask part follows
    (mmcv layout, reference feat_prop.py:37-53). flow_1/flow_2:
    (N, Ho, Wo, 2) (dx, dy)-last; o1 groups [0, G/2) ride flow_1, o2
    groups flow_2.

    Returns (out, bound) with bound = max |off_y| — the measured quantity
    the band contract is checked against (data/pipeline.py stage 2.5).
    """
    n, h, wdt, cin = x.shape
    kh, kw, wcin, cout = w.shape
    k = kh * kw
    g = head.shape[-1] // (3 * k)
    assert head.shape[-1] == 3 * k * g, (
        f"offset-head channels {head.shape[-1]} not divisible by 3*k={3 * k}"
        " — malformed head would silently mis-split offsets/mask")
    cg = cin // g
    ho = h + 2 * padding - kh + 1
    wo = wdt + 2 * padding - kw + 1
    assert (ho, wo) == head.shape[1:3] and wcin == cin
    dy_lo = -(band // 2)
    hp = -(-ho // 8) * 8
    nx = -(-(wo + 1) // LANES)   # lane tiles (multi-tile gather for wide maps)
    wp = LANES * nx

    res = (max_residue
           * jnp.tanh(head[..., : 2 * k * g].astype(jnp.float32)))
    res = res.reshape(n, ho, wo, g, k, 2)
    res = res.transpose(0, 3, 4, 1, 2, 5)            # (N, G, K, Ho, Wo, 2)
    half = g // 2
    # flow channels are (dx, dy); DCN offsets are (dy, dx)

    def with_flow(comp):
        f1 = flow_1[..., 1 - comp].astype(jnp.float32)
        f2 = flow_2[..., 1 - comp].astype(jnp.float32)
        fl = jnp.concatenate([
            jnp.broadcast_to(f1[:, None], (n, half, ho, wo)),
            jnp.broadcast_to(f2[:, None], (n, g - half, ho, wo))], axis=1)
        return res[..., comp] + fl[:, :, None]       # (N, G, K, Ho, Wo)

    off_y = with_flow(0)
    off_x = with_flow(1)
    bound = jnp.abs(off_y).max()

    ky = jnp.repeat(jnp.arange(kh, dtype=jnp.float32), kw)
    kx = jnp.tile(jnp.arange(kw, dtype=jnp.float32), kh)
    base_y = (jnp.arange(ho, dtype=jnp.float32) - padding)[:, None] \
        + jnp.zeros((1, wo), jnp.float32)
    base_x = (jnp.arange(wo, dtype=jnp.float32) - padding)[None, :] \
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

    # per-strip row bounds straight from the transposed off_y (same
    # derivation as modulated_deform_conv2d_banded; padded strips get
    # lo == hi -> swept nothing)
    strips = _n_strips(hp)
    sr = hp // strips
    rel = off_y + (ky[None, None, :, None, None] - padding) - dy_lo
    pad5 = ((0, 0), (0, 0), (0, 0), (0, hp - ho), (0, 0))
    rel_min = jnp.pad(rel, pad5, constant_values=1e9).reshape(
        n * g, k, strips, sr, wo).min(axis=(3, 4))
    rel_max = jnp.pad(rel, pad5, constant_values=-1e9).reshape(
        n * g, k, strips, sr, wo).max(axis=(3, 4))
    row_lo = jnp.clip(jnp.floor(rel_min), 0, band).astype(jnp.int32)
    row_hi = jnp.clip(jnp.floor(rel_max) + 2, 0, band).astype(jnp.int32)
    row_hi = jnp.maximum(row_hi, row_lo)           # (N*G, K, S)

    out = _sample_and_contract(
        x, pyg, pxg, mg, row_lo, row_hi, w, b, n=n, g=g, k=k, cg=cg,
        ho=ho, wo=wo, hp=hp, wp=wp, band=band, dy_lo=dy_lo,
        interpret=interpret, light=light, nx=nx)
    return out, bound
