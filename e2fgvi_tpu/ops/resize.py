"""Bilinear resize with exact PyTorch `F.interpolate` semantics, as matmuls.

TPU-first design: a separable bilinear resize is a pair of small dense
contractions against precomputed interpolation matrices. Each row of an
interpolation matrix has at most two non-zeros, so the math is identical to a
gather-based implementation, but the work lands on the MXU instead of issuing
scatter/gather ops, and XLA can fuse the two contractions with neighbouring
elementwise work.

Semantics reproduced (parity-critical for E2FGVI; see reference
model/e2fgvi.py:214-219, model/modules/flow_comp.py:121-124/150-163,
model/e2fgvi.py:126-129):

- ``align_corners=True``:  src = dst * (in-1)/(out-1)            (0 if out==1)
- ``align_corners=False``: src = max(0, (dst+0.5) * in/out - 0.5)

Both match torch's ``area_pixel_compute_source_index`` for bilinear.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool,
                   dtype=np.float32) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=dtype)
    # torch computes coordinates in the input dtype (float32) — emulate its
    # rounding exactly, it shifts interpolation weights by ~3e-5.
    f32 = np.float32
    dst = np.arange(out_size, dtype=f32)
    if out_size == 1 or in_size == 1:
        if align_corners or in_size == 1:
            # torch: src index 0 for every dst when out==1 (align_corners)
            # or trivially when in==1.
            src = np.zeros(out_size, f32)
        else:
            scale = f32(in_size / out_size)
            src = np.maximum(f32(0.0), (dst + f32(0.5)) * scale - f32(0.5))
    elif align_corners:
        scale = f32((in_size - 1) / (out_size - 1))
        src = dst * scale
    else:
        scale = f32(in_size / out_size)
        src = np.maximum(f32(0.0), (dst + f32(0.5)) * scale - f32(0.5))
    i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(dtype)
    w0 = (1.0 - w1).astype(dtype)
    rows = np.arange(out_size)
    # i0 may equal i1 at the right edge; add, don't overwrite.
    np.add.at(m, (rows, i0), w0)
    np.add.at(m, (rows, i1), w1)
    return m


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool) -> jnp.ndarray:
    """Bilinearly resize channel-last images.

    Args:
      x: (..., H, W, C).
      out_h, out_w: static output sizes.
      align_corners: PyTorch align_corners flag.
    Returns:
      (..., out_h, out_w, C), same dtype as x (accumulated in f32).
    """
    h, w = x.shape[-3], x.shape[-2]
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if w != out_w:
        mw = jnp.asarray(_interp_matrix(w, out_w, align_corners))
        # (..., H, W, C) x (out_w, W) -> (..., H, out_w, C)
        xf = jnp.einsum("...wc,vw->...vc", xf, mw)
    if h != out_h:
        mh = jnp.asarray(_interp_matrix(h, out_h, align_corners))
        xf = jnp.einsum("...hwc,uh->...uwc", xf, mh)
    return xf.astype(orig_dtype)


def resize_scale_quarter(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.interpolate(scale_factor=1/4, bilinear, align_corners=True,
    recompute_scale_factor=True): output size floor(in * 0.25), then
    align_corners=True sampling (reference model/e2fgvi.py:214-219)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, int(np.floor(h * 0.25)), int(np.floor(w * 0.25)),
                           align_corners=True)


def resize_scale2_aligned(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.interpolate(scale_factor=2, bilinear, align_corners=True)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, 2 * h, 2 * w, align_corners=True)


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pooling, channel-last, exact for even H, W.

    Matches torch F.avg_pool2d(kernel_size=2, stride=2,
    count_include_pad=False) on even inputs (SPyNet always pools shapes that
    are multiples of 32; reference flow_comp.py:101-111). Odd trailing
    rows/cols are dropped, as in torch (floor division output size).
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = h // 2, w // 2
    x = x[..., : oh * 2, : ow * 2, :]
    shape = x.shape[:-3] + (oh, 2, ow, 2, x.shape[-1])
    return x.reshape(shape).mean(axis=(-4, -2))
