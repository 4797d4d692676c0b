"""Golden tests: ops.resize vs torch F.interpolate / F.avg_pool2d."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from e2fgvi_tpu.ops.resize import (
    resize_bilinear, resize_scale_quarter, resize_scale2_aligned, avg_pool_2x2)


def _torch_resize(x_nhwc, size=None, scale=None, align_corners=False,
                  recompute=None):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1))
    kwargs = dict(mode="bilinear", align_corners=align_corners)
    if scale is not None:
        kwargs["scale_factor"] = scale
        if recompute is not None:
            kwargs["recompute_scale_factor"] = recompute
    else:
        kwargs["size"] = size
    out = F.interpolate(t, **kwargs)
    return np.moveaxis(out.numpy(), 1, -1)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("inhw,outhw", [
    ((240, 432), (60, 108)),
    ((60, 108), (64, 128)),     # SPyNet mult-of-32 upsize
    ((64, 128), (60, 108)),     # SPyNet downsize back
    ((7, 13), (15, 4)),
    ((1, 5), (3, 9)),
])
def test_resize_matches_torch(rng, align, inhw, outhw):
    x = rng.standard_normal((2, *inhw, 3), dtype=np.float32)
    ref = _torch_resize(x, size=outhw, align_corners=align)
    got = np.asarray(resize_bilinear(jnp.asarray(x), *outhw, align))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_quarter_scale_matches_torch(rng):
    # reference model/e2fgvi.py:214-219 exact call
    x = rng.standard_normal((3, 240, 432, 3), dtype=np.float32)
    ref = _torch_resize(x, scale=0.25, align_corners=True, recompute=True)
    got = np.asarray(resize_scale_quarter(jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_scale2_matches_torch(rng):
    # SPyNet pyramid upsample (flow_comp.py:121-124) & decoder deconv
    x = rng.standard_normal((2, 30, 54, 2), dtype=np.float32)
    ref = _torch_resize(x, scale=2, align_corners=True)
    got = np.asarray(resize_scale2_aligned(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_avg_pool_2x2(rng):
    x = rng.standard_normal((2, 64, 128, 3), dtype=np.float32)
    t = torch.from_numpy(np.moveaxis(x, -1, 1))
    ref = np.moveaxis(
        F.avg_pool2d(t, 2, 2, count_include_pad=False).numpy(), 1, -1)
    got = np.asarray(avg_pool_2x2(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
