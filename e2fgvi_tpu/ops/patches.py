"""Patch extraction (im2col) and overlap-add composition (col2im).

Replaces torch ``nn.Unfold`` / ``nn.Fold`` (ATen; used by the reference soft
split / soft composition and the F3N feed-forward — tfocal_transformer.py:24,
56-59, 84-86) with XLA-native formulations:

- `unfold` is a stack of static strided slices over a padded input, exposed as
  an explicit (kh, kw) patch grid. XLA fuses the slices; downstream, the patch
  axis feeds a single GEMM (the token embedding), which is the MXU-friendly
  shape of the reference's Unfold + Linear pair.
- `fold` is the exact linear adjoint of `unfold`, obtained via
  `jax.linear_transpose`. torch's Fold is defined as the adjoint of Unfold
  (overlap-add), so this matches bit-for-bit up to f32 summation order.

Layout convention: channel-last patches (N, Lh, Lw, kh, kw, C). torch's
Unfold flattens channels c-major (c*kh*kw + i*kw + j); converters reorder
weights once at load time instead of transposing activations at runtime.
"""

from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def _norm2(v):
    return (v, v) if isinstance(v, int) else tuple(v)


# Patch volumes up to this many channels run as a one-hot-kernel convolution
# (pure MXU work) instead of 49 strided slices; above it the constant kernel
# would be too large and the slice path wins.
_MXU_UNFOLD_MAX_CHANNELS = 4096


@lru_cache(maxsize=32)
def _onehot_kernel(kh: int, kw: int, c: int) -> np.ndarray:
    """(kh, kw, c, kh*kw*c) kernel with W[i,j,ch, (i*kw+j)*c + ch] = 1.

    conv2d with this kernel IS unfold (k-major patch layout): turning the
    patch-extraction memory op into an MXU contraction — the standard TPU
    trade of FLOPs for layout work."""
    w = np.zeros((kh, kw, c, kh * kw * c), np.float32)
    for i in range(kh):
        for j in range(kw):
            for ch in range(c):
                w[i, j, ch, (i * kw + j) * c + ch] = 1.0
    return w


def unfold_shape(h: int, w: int, kernel, stride, padding):
    kh, kw = _norm2(kernel)
    sh, sw = _norm2(stride)
    ph, pw = _norm2(padding)
    lh = (h + 2 * ph - kh) // sh + 1
    lw = (w + 2 * pw - kw) // sw + 1
    return lh, lw


def unfold_slices(x: jnp.ndarray, kernel, stride=1, padding=0) -> jnp.ndarray:
    """Slice-based patch extraction (the `unfold` reference path; also the
    closure whose linear transpose defines `fold`)."""
    kh, kw = _norm2(kernel)
    sh, sw = _norm2(stride)
    ph, pw = _norm2(padding)
    n, h, w, c = x.shape
    lh, lw = unfold_shape(h, w, (kh, kw), (sh, sw), (ph, pw))
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    rows = []
    for i in range(kh):
        cols = []
        for j in range(kw):
            sl = xp[:, i: i + (lh - 1) * sh + 1: sh,
                    j: j + (lw - 1) * sw + 1: sw, :]
            cols.append(sl)
        rows.append(jnp.stack(cols, axis=3))          # (N, Lh, Lw, kw, C)
    return jnp.stack(rows, axis=3)                    # (N, Lh, Lw, kh, kw, C)


def unfold(x: jnp.ndarray, kernel, stride=1, padding=0) -> jnp.ndarray:
    """Extract sliding patches.

    Small patch volumes run as a one-hot-kernel convolution (MXU); large
    ones fall back to strided slices.

    Args:
      x: (N, H, W, C).
    Returns:
      (N, Lh, Lw, kh, kw, C) where Lh/Lw follow torch's Unfold formula.
    """
    kh, kw = _norm2(kernel)
    sh, sw = _norm2(stride)
    ph, pw = _norm2(padding)
    n, h, w, c = x.shape
    lh, lw = unfold_shape(h, w, (kh, kw), (sh, sw), (ph, pw))

    if kh * kw * c <= _MXU_UNFOLD_MAX_CHANNELS:
        from e2fgvi_tpu.ops.convs import conv2d
        k = jnp.asarray(_onehot_kernel(kh, kw, c))
        out = conv2d(x, k, None, stride=(sh, sw), padding=(ph, pw))
        return out.reshape(n, lh, lw, kh, kw, c)

    return unfold_slices(x, kernel, stride, padding)


def fold_transpose(patches: jnp.ndarray, output_size, kernel, stride=1,
                   padding=0) -> jnp.ndarray:
    """Reference fold: exact linear adjoint of the slice-based unfold."""
    h, w = output_size
    n, lh, lw, kh, kw, c = patches.shape
    f = partial(unfold_slices, kernel=kernel, stride=stride, padding=padding)
    example = jax.ShapeDtypeStruct((n, h, w, c), patches.dtype)
    (out,) = jax.linear_transpose(f, example)(patches)
    return out


def fold(patches: jnp.ndarray, output_size, kernel, stride=1,
         padding=0) -> jnp.ndarray:
    """Overlap-add patches back to an image (torch Fold semantics: sum).

    Phase-grouped formulation: output pixels are partitioned by their
    (y % sh, x % sw) phase; within a phase, each contributing kernel tap is
    a *shifted copy* of one (Lh, Lw) patch plane. The overlap-add becomes
    kh*kw small (Lh+J, Lw+J)-sized pad+adds plus one interleaving reshape —
    ~ (kh/sh)*(kw/sw) times less memory traffic than padding each tap to the
    full canvas, with no convolution or scatter (the conv-based formulations
    miscompile on this TPU backend for large shapes; the one-hot conv
    transpose and input-dilated conv both produce wrong values at
    fold(60x108, k7, s3) — see tests/test_ops_patches.py).

    Args:
      patches: (N, Lh, Lw, kh, kw, C).
      output_size: (H, W).
    Returns:
      (N, H, W, C).
    """
    h, w = output_size
    kh, kw = _norm2(kernel)
    sh, sw = _norm2(stride)
    ph, pw = _norm2(padding)
    n, lh, lw, _, _, c = patches.shape

    jh = -(-kh // sh)                       # taps per phase (ceil)
    jw = -(-kw // sw)
    slot_h = lh + jh - 1                    # phase-canvas slots
    slot_w = lw + jw - 1

    # phase canvases: (N, slot_h, sh, slot_w, sw, C)
    rows = []
    for ry in range(sh):
        cols = []
        for rx in range(sw):
            acc = None
            for jy in range(jh):
                ki = ry + jy * sh
                if ki >= kh:
                    continue
                for jx in range(jw):
                    kj = rx + jx * sw
                    if kj >= kw:
                        continue
                    plane = patches[:, :, :, ki, kj, :]
                    plane = jnp.pad(
                        plane,
                        ((0, 0), (jy, slot_h - lh - jy),
                         (jx, slot_w - lw - jx), (0, 0)))
                    acc = plane if acc is None else acc + plane
            if acc is None:
                acc = jnp.zeros((n, slot_h, slot_w, c), patches.dtype)
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=3))      # (N, Sh, Sw, sw, C)
    canvas = jnp.stack(rows, axis=2)              # (N, Sh, sh, Sw, sw, C)
    canvas = canvas.reshape(n, slot_h * sh, slot_w * sw, c)

    # crop the torch padding; the phase canvas may be a few rows larger or
    # smaller than the padded torch canvas — pad defensively first
    need_h = ph + h
    need_w = pw + w
    if canvas.shape[1] < need_h or canvas.shape[2] < need_w:
        canvas = jnp.pad(canvas,
                         ((0, 0), (0, max(0, need_h - canvas.shape[1])),
                          (0, max(0, need_w - canvas.shape[2])), (0, 0)))
    return canvas[:, ph: ph + h, pw: pw + w, :]


def fold_counts(output_size, kernel, stride, padding, dtype=jnp.float32):
    """fold(ones): per-pixel patch coverage counts, shape (H, W, 1).

    Static for static shapes — XLA constant-folds it under jit. Used by the
    F3N feed-forward normalization (reference tfocal_transformer.py:92-96).
    """
    h, w = output_size
    lh, lw = unfold_shape(h, w, kernel, stride, padding)
    kh, kw = _norm2(kernel)
    ones = jnp.ones((1, lh, lw, kh, kw, 1), dtype=dtype)
    return fold(ones, output_size, kernel, stride, padding)[0]


def fold_normalized(patches: jnp.ndarray, output_size, kernel, stride=1,
                    padding=0) -> jnp.ndarray:
    """fold(patches) / fold(ones) — mean overlap-add."""
    out = fold(patches, output_size, kernel, stride, padding)
    cnt = fold_counts(output_size, kernel, stride, padding, dtype=out.dtype)
    return out / cnt[None]
