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


@lru_cache(maxsize=256)
def _interp_taps(in_size: int, out_size: int, align_corners: bool):
    """Per-output 2-tap (index0, index1, weight0) arrays, torch-exact.

    Derived from the interpolation matrix so both formulations share the
    f32 coordinate arithmetic."""
    m = _interp_matrix(in_size, out_size, align_corners)
    i0 = np.zeros(out_size, np.int32)
    i1 = np.zeros(out_size, np.int32)
    w0 = np.zeros(out_size, np.float32)
    for r in range(out_size):
        nz = np.nonzero(m[r])[0]
        if len(nz) == 1:
            i0[r] = i1[r] = nz[0]
            w0[r] = 1.0
        else:
            i0[r], i1[r] = nz[0], nz[-1]
            w0[r] = m[r, i0[r]]
    return i0, i1, w0


def _resize_axis(xf, in_size, out_size, align_corners, axis):
    i0, i1, w0 = _interp_taps(in_size, out_size, align_corners)
    t0 = jnp.take(xf, jnp.asarray(i0), axis=axis)
    t1 = jnp.take(xf, jnp.asarray(i1), axis=axis)
    shape = [1] * xf.ndim
    shape[axis] = out_size
    w0j = jnp.asarray(w0).reshape(shape)
    return t0 * w0j + t1 * (1.0 - w0j)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool) -> jnp.ndarray:
    """Bilinearly resize channel-last images (torch F.interpolate semantics).

    Two formulations with identical math, dispatched on dtype:

    - f32 (parity paths): separable 2-tap gather + lerp with static indices
      — exact torch weights, no matmul rounding.
    - bf16 (speed paths): dense interpolation matmuls. On TPU the per-output
      2-tap gather lowers to a slow general gather, while an
      (out, in) matmul rides the MXU; the matrices are tiny and the extra
      MACs multiply zeros.

    Args:
      x: (..., H, W, C).
      out_h, out_w: static output sizes.
      align_corners: PyTorch align_corners flag.
    Returns:
      (..., out_h, out_w, C), same dtype as x (accumulated in f32).
    """
    h, w = x.shape[-3], x.shape[-2]
    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16:
        xf = x
        if w != out_w:
            mw = jnp.asarray(_interp_matrix(w, out_w, align_corners))
            xf = jnp.einsum("...wc,vw->...vc", xf, mw,
                            preferred_element_type=jnp.float32
                            ).astype(orig_dtype)
        if h != out_h:
            mh = jnp.asarray(_interp_matrix(h, out_h, align_corners))
            xf = jnp.einsum("...hwc,uh->...uwc", xf, mh,
                            preferred_element_type=jnp.float32
                            ).astype(orig_dtype)
        return xf
    xf = x.astype(jnp.float32)
    if w != out_w:
        xf = _resize_axis(xf, w, out_w, align_corners, xf.ndim - 2)
    if h != out_h:
        xf = _resize_axis(xf, h, out_h, align_corners, xf.ndim - 3)
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
