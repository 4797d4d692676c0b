"""Oracle tests for the modulated deformable conv (DCNv2) op.

mmcv is not installed here, so the oracle is an independent, literal numpy
implementation of DCNv2 semantics (per-tap bilinear sampling with
zero-outside corners, sigmoid-mask modulation, then a standard conv
contraction), matching mmcv's `dmcn_im2col_bilinear` + gemm."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from e2fgvi_tpu.ops.dcn import modulated_deform_conv2d

_dcn = jax.jit(modulated_deform_conv2d)


def dcn_numpy(x, offset, mask, w, b, padding=1):
    """x (N,H,W,Cin), offset (N,Ho,Wo,G,K,2)(dy,dx), mask (N,Ho,Wo,G,K),
    w (kh,kw,Cin,Cout), b (Cout,)."""
    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    g = offset.shape[3]
    cg = cin // g
    ho = h + 2 * padding - kh + 1
    wo = wd + 2 * padding - kw + 1
    out = np.zeros((n, ho, wo, cout), np.float64)

    def sample(img2d, py, px):  # img2d (H,W), scalar float coords
        if py <= -1 or py >= h or px <= -1 or px >= wd:
            return 0.0
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        acc = 0.0
        for (yy, xx) in [(y0, x0), (y0, x0 + 1), (y0 + 1, x0),
                         (y0 + 1, x0 + 1)]:
            if 0 <= yy < h and 0 <= xx < wd:
                wgt = (1 - abs(py - yy)) * (1 - abs(px - xx))
                acc += wgt * img2d[yy, xx]
        return acc

    for ni in range(n):
        for oy in range(ho):
            for ox in range(wo):
                for ki in range(kh * kw):
                    iy, ix = divmod(ki, kw)
                    for gi in range(g):
                        dy = offset[ni, oy, ox, gi, ki, 0]
                        dx = offset[ni, oy, ox, gi, ki, 1]
                        m = mask[ni, oy, ox, gi, ki]
                        py = oy - padding + iy + dy
                        px = ox - padding + ix + dx
                        for ci in range(gi * cg, (gi + 1) * cg):
                            v = sample(x[ni, :, :, ci], py, px)
                            out[ni, oy, ox, :] += (
                                v * m * w[iy, ix, ci, :])
    return (out + b).astype(np.float32)


@pytest.mark.parametrize("g,cin,cout,hw", [
    (2, 4, 3, (5, 6)),
    (4, 8, 5, (4, 7)),
])
def test_dcn_matches_numpy_oracle(rng, g, cin, cout, hw):
    h, w = hw
    n, kh, kw = 2, 3, 3
    k = kh * kw
    x = rng.standard_normal((n, h, w, cin), dtype=np.float32)
    # offsets spanning in-bounds and out-of-bounds sampling
    offset = (rng.standard_normal((n, h, w, g, k, 2)) * 2.5).astype(np.float32)
    mask = rng.uniform(0, 1, size=(n, h, w, g, k)).astype(np.float32)
    wgt = (rng.standard_normal((kh, kw, cin, cout)) * 0.2).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    ref = dcn_numpy(x, offset, mask, wgt, b)
    got = np.asarray(_dcn(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dcn_zero_offset_equals_conv(rng):
    """With zero offsets and mask==1, DCN must equal a plain 3x3 conv."""
    import torch
    import torch.nn.functional as F
    n, h, w, cin, cout, g = 1, 6, 8, 8, 4, 4
    x = rng.standard_normal((n, h, w, cin), dtype=np.float32)
    wgt = (rng.standard_normal((3, 3, cin, cout)) * 0.3).astype(np.float32)
    b = np.zeros(cout, np.float32)
    offset = np.zeros((n, h, w, g, 9, 2), np.float32)
    mask = np.ones((n, h, w, g, 9), np.float32)
    got = np.asarray(_dcn(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt), jnp.asarray(b)))
    ref = F.conv2d(torch.from_numpy(np.moveaxis(x, -1, 1)),
                   torch.from_numpy(np.transpose(wgt, (3, 2, 0, 1))),
                   padding=1).numpy()
    np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1),
                               rtol=1e-4, atol=1e-4)
