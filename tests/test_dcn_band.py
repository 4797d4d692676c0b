"""Banded Pallas DCN sampler vs the XLA block-gather reference impl.

The banded kernel must be bit-level-close to ops.dcn.modulated_deform_conv2d
whenever the vertical offsets respect the band contract — including samples
pushed outside the image (zeros semantics) and arbitrary horizontal offsets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2fgvi_tpu.kernels.dcn_band import (band_for_flow_bound,
                                         modulated_deform_conv2d_banded)
from e2fgvi_tpu.ops.dcn import modulated_deform_conv2d


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _inputs(rng, n=1, h=12, w=16, cin=8, g=2, cout=4, off_scale=3.0):
    k = 9
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    offset = (rng.uniform(-1, 1, (n, h, w, g, k, 2)) * off_scale
              ).astype(np.float32)
    mask = rng.uniform(0, 1, (n, h, w, g, k)).astype(np.float32)
    wgt = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2
    b = rng.standard_normal((cout,)).astype(np.float32)
    return x, offset, mask, wgt, b


import pytest


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """Interpret-mode pallas compiles degrade severely when several pile up
    in one process on this host — clear the in-process trace/executable
    caches between tests (the persistent on-disk cache keeps reruns fast).
    """
    yield
    import jax
    jax.clear_caches()


def test_banded_matches_xla_block_gather(rng):
    x, offset, mask, wgt, b = _inputs(rng)
    want = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(wgt),
                                   jnp.asarray(b))
    got = modulated_deform_conv2d_banded(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b), band=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_banded_zeros_outside_image(rng):
    # offsets large enough to push many samples outside the image but
    # still inside the vertical band -> zeros semantics must match
    x, offset, mask, wgt, b = _inputs(rng, h=10, w=12, off_scale=0.0)
    offset = offset + rng.uniform(4, 9, offset.shape).astype(np.float32) * \
        np.sign(rng.standard_normal(offset.shape)).astype(np.float32)
    want = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(wgt),
                                   jnp.asarray(b))
    got = modulated_deform_conv2d_banded(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b), band=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_feat_prop_banded_matches_default(rng):
    """bidirectional_propagation with dcn_band == without (flows small)."""
    from e2fgvi_tpu.models import feat_prop
    c = 8
    params = feat_prop.init_params(jax.random.PRNGKey(0), channel=c)
    # zero-init offset head (reference init) -> offsets = flow only
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 16, c)), jnp.float32)
    flows = jnp.asarray(rng.uniform(-2, 2, (1, 3, 8, 16, 2)), jnp.float32)
    want = feat_prop.bidirectional_propagation(params, x, flows, flows)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = feat_prop.bidirectional_propagation(params, x, flows, flows,
                                                  dcn_band=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_flow_warp_banded_matches_xla(rng):
    """Banded warp (the K=1 sampler reuse) vs ops.warp.flow_warp — both
    the light full-sweep and the production scalar-prefetch variant,
    including samples pushed outside the image (zeros semantics) and a
    channel count that tiles across the group axis."""
    from e2fgvi_tpu.kernels.dcn_band import flow_warp_banded
    from e2fgvi_tpu.ops.warp import flow_warp
    n, h, w, c = 2, 12, 16, 128  # c=128 -> two 64-channel tiles
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-5, 5, (n, h, w, 2)), jnp.float32)
    # push a stripe outside the image: zeros semantics
    flow = flow.at[:, :2].add(jnp.asarray([0.0, -9.0]))
    want = flow_warp(x, flow)
    for light in (True, False):
        got = flow_warp_banded(x, flow, band=24, interpret=True,
                               light=light)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)


def test_flow_warp_banded_small_channels(rng):
    """C=2 (the flow-composition warp in feat_prop)."""
    from e2fgvi_tpu.kernels.dcn_band import flow_warp_banded
    from e2fgvi_tpu.ops.warp import flow_warp
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 2)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-3, 3, (1, 8, 16, 2)), jnp.float32)
    want = flow_warp(x, flow)
    got = flow_warp_banded(x, flow, band=16, interpret=True, light=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_band_for_flow_bound():
    assert band_for_flow_bound(0.0) == 32
    assert band_for_flow_bound(1.4) == 32
    assert band_for_flow_bound(5.0) == 48
    assert band_for_flow_bound(11.0) == 64
    assert band_for_flow_bound(60.0) is None


def test_scalar_prefetch_bounds_variant(rng):
    """The production (light=False) scalar-prefetch variant: the per-tile
    row_lo/row_hi block-skipping bounds must be exact — a off-by-one in
    the bounds math drops a contributing source block and diverges from
    the XLA reference. Offsets are crafted per batch/group so different
    tiles need different block ranges, including corner samples exactly
    on block boundaries."""
    x, offset, mask, wgt, b = _inputs(rng, n=2, off_scale=0.0)
    # tile-varying vertical offsets WITHIN the band-16 contract
    # (py - row in [-8, 6] incl. the +-1 tap): group 0 small, group 1
    # pushed toward the band edges so different tiles need different
    # block ranges; include exact integers (floor==py)
    offset[..., 0] += rng.uniform(-1.0, 1.0, offset.shape[:-1])
    offset[0, :, :, 1, :, 0] += 3.5       # needs the upper block
    offset[1, :, :, 0, :, 0] -= 5.0       # needs the lower block
    offset[0, 2, 3, 0, 4, 0] = 3.0        # exact integer sample
    offset[..., 1] += rng.uniform(-3, 3, offset.shape[:-1])
    want = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(wgt),
                                   jnp.asarray(b))
    got = modulated_deform_conv2d_banded(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b), band=16, interpret=True,
        light=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_strip_bounds_row_gradient(rng):
    """Per-strip skip bounds (strips > 1): a strong vertical offset
    gradient by output row makes different 8-row strips need DISJOINT
    band-block ranges — a wrong strip->bound mapping (or an off-by-one in
    the strip slicing of src/py/acc) drops contributing rows and diverges
    from the XLA reference. h=24 -> hp=24 -> 3 strips of 8."""
    x, offset, mask, wgt, b = _inputs(rng, n=1, h=24, w=16, off_scale=0.0)
    grad = np.linspace(-6.0, 6.0, 24, dtype=np.float32)  # per output row
    offset[..., 0] += grad[None, :, None, None, None]
    offset[..., 0] += rng.uniform(-0.5, 0.5,
                                  offset.shape[:-1]).astype(np.float32)
    offset[..., 1] += rng.uniform(-3, 3,
                                  offset.shape[:-1]).astype(np.float32)
    want = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(wgt),
                                   jnp.asarray(b))
    got = modulated_deform_conv2d_banded(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b), band=24, interpret=True,
        light=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("blk_rows", [8, 4, 2])
def test_regacc_sweep_matches_xla(rng, blk_rows, monkeypatch):
    """The register-accumulation sweep (E2FGVI_DCN_REGACC: strip slabs
    carried through lax.cond instead of the VMEM scratch) must be exact
    at every gated-block granularity — the block rounding only ever adds
    zero-weight rows. Reuses the strip-gradient scenario where different
    strips need disjoint block ranges."""
    from e2fgvi_tpu.kernels import dcn_band as bl
    monkeypatch.setattr(bl, "REGACC", True)
    monkeypatch.setattr(bl, "BLK_ROWS", blk_rows)
    x, offset, mask, wgt, b = _inputs(rng, n=1, h=24, w=16, off_scale=0.0)
    grad = np.linspace(-6.0, 6.0, 24, dtype=np.float32)
    offset[..., 0] += grad[None, :, None, None, None]
    offset[..., 0] += rng.uniform(-0.5, 0.5,
                                  offset.shape[:-1]).astype(np.float32)
    offset[..., 1] += rng.uniform(-3, 3,
                                  offset.shape[:-1]).astype(np.float32)
    want = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(wgt),
                                   jnp.asarray(b))
    got = modulated_deform_conv2d_banded(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b), band=24, interpret=True,
        light=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_flow_warp_banded_row_gradient(rng):
    """Strip bounds on the warp path: flow_y gradient across rows."""
    from e2fgvi_tpu.kernels.dcn_band import flow_warp_banded
    from e2fgvi_tpu.ops.warp import flow_warp
    n, h, w, c = 1, 24, 16, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    fy = np.linspace(-7.0, 7.0, h, dtype=np.float32)
    flow = rng.uniform(-1, 1, (n, h, w, 2)).astype(np.float32)
    flow[..., 1] += fy[None, :, None]
    flow = jnp.asarray(flow)
    want = flow_warp(x, flow)
    got = flow_warp_banded(x, flow, band=24, interpret=True, light=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_packed_bf16_gather_paths(rng):
    """bf16 inputs route through the packed int32 single-gather source
    format (_pack_pairs); its unpacked f32 corner values are bit-identical
    to the two-gather form, so the banded bf16 result must track the XLA
    bf16 reference as closely as the f32 path tracks its reference (only
    accumulation-order noise at bf16 scale). Covers DCN and both warp
    variants."""
    from e2fgvi_tpu.kernels.dcn_band import flow_warp_banded
    from e2fgvi_tpu.ops.warp import flow_warp
    x, offset, mask, wgt, b = _inputs(rng)
    want = modulated_deform_conv2d(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(offset),
        jnp.asarray(mask), jnp.asarray(wgt, jnp.bfloat16),
        jnp.asarray(b, jnp.bfloat16))
    got = modulated_deform_conv2d_banded(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(offset),
        jnp.asarray(mask), jnp.asarray(wgt, jnp.bfloat16),
        jnp.asarray(b, jnp.bfloat16), band=32, interpret=True, light=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=5e-2)
    xw = jnp.asarray(rng.standard_normal((1, 8, 16, 4)), jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-3, 3, (1, 8, 16, 2)), jnp.float32)
    want_w = flow_warp(xw, flow)
    for light in (True, False):
        got_w = flow_warp_banded(xw, flow, band=16, interpret=True,
                                 light=light)
        np.testing.assert_allclose(np.asarray(got_w, np.float32),
                                   np.asarray(want_w, np.float32),
                                   rtol=3e-2, atol=5e-2)


def test_head_fused_matches_split_form(rng):
    """modulated_deform_conv2d_banded_head (tanh/sigmoid/flow-add fused
    into the position prelude) vs _offsets_from_head + the banded sampler
    — the exactness the serving path relies on (feat_prop._deform_align
    banded branch)."""
    from e2fgvi_tpu.kernels.dcn_band import (
        modulated_deform_conv2d_banded_head)
    from e2fgvi_tpu.models import feat_prop as fp

    n, h, w = 1, 12, 16
    g, k = 4, 9
    cin, cout = 8, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.float32)
    head = jnp.asarray(rng.standard_normal((n, h, w, 3 * k * g)) * 0.3,
                       jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((n, h, w, 2)) * 2, jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((n, h, w, 2)) * 2, jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                      jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)

    group_backup = fp.DEFORM_GROUPS
    fp.DEFORM_GROUPS = g
    try:
        offsets, mask = fp._offsets_from_head(head, f1, f2)
    finally:
        fp.DEFORM_GROUPS = group_backup
    want = modulated_deform_conv2d_banded(
        x, offsets.astype(jnp.float32), mask.astype(jnp.float32), wgt, b,
        band=32, interpret=True)
    want_bound = float(jnp.abs(offsets[..., 0]).max())

    got, bound = modulated_deform_conv2d_banded_head(
        x, head, f1, f2, wgt, b, band=32, max_residue=10.0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert abs(float(bound) - want_bound) < 1e-6


def test_head_fused_production_bounds(rng):
    """The head-fused variant's per-strip bounds path (light=False) in
    interpret mode — the exact code the TPU runs."""
    from e2fgvi_tpu.kernels.dcn_band import (
        modulated_deform_conv2d_banded_head)

    n, h, w = 1, 16, 20
    g, k = 2, 9
    cin, cout = 4, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.float32)
    head = jnp.asarray(rng.standard_normal((n, h, w, 3 * k * g)) * 0.3,
                       jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((n, h, w, 2)) * 2, jnp.float32)
    f2 = jnp.zeros((n, h, w, 2), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                      jnp.float32)

    light, _ = modulated_deform_conv2d_banded_head(
        x, head, f1, f2, wgt, None, band=32, interpret=True, light=True)
    prod, _ = modulated_deform_conv2d_banded_head(
        x, head, f1, f2, wgt, None, band=32, interpret=True, light=False)
    np.testing.assert_allclose(np.asarray(prod), np.asarray(light),
                               rtol=1e-6, atol=1e-6)


def test_banded_wide_map_multi_tile(rng):
    """Maps wider than one 128-lane vreg (HQ/720p quarter-res) run the
    nx>1 multi-tile gather — must match the XLA sampler exactly,
    including horizontal offsets that cross the 128-lane tile boundary."""
    x, offset, mask, wgt, b = _inputs(rng, h=8, w=150, off_scale=3.0)
    # force tile-crossing horizontal samples around lane 128
    offset[..., 1] += rng.uniform(-30, 30, offset.shape[:-1])
    want = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(wgt),
                                   jnp.asarray(b))
    got = modulated_deform_conv2d_banded(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b), band=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_flow_warp_banded_wide_map(rng):
    """flow_warp_banded on a 2-lane-tile width vs the XLA warp."""
    from e2fgvi_tpu.kernels.dcn_band import flow_warp_banded
    from e2fgvi_tpu.ops.warp import flow_warp
    x = rng.standard_normal((2, 16, 200, 8)).astype(np.float32)
    flow = (rng.uniform(-1, 1, (2, 16, 200, 2)) * 40).astype(np.float32)
    flow[..., 1] = np.clip(flow[..., 1], -6, 6)   # respect the band
    want = flow_warp(jnp.asarray(x), jnp.asarray(flow))
    got = flow_warp_banded(jnp.asarray(x), jnp.asarray(flow), band=24,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
