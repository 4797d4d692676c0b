"""Fused F3N token mixing: fold -> overlap-normalize -> unfold, one kernel.

The F3N feed-forward (reference tfocal_transformer.py:75-98) folds the 1960
hidden units (as 49 taps x 40 channels) onto the feature canvas, divides by
the overlap counts, and unfolds back. Composed as XLA ops this round-trips
the canvas through HBM per transformer block; here the whole chain runs in
VMEM per frame (all addressing is static, so it lowers cleanly on Mosaic).

Exact math of ops.patches.fold/fold_normalized/unfold for the t2t geometry;
equality is tested in interpret mode (tests/test_kernels.py) and on device.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2fgvi_tpu.ops.patches import unfold_shape


def _counts_np(output_size, kernel, stride, padding):
    """Per-pixel patch coverage counts in pure numpy (trace-time const)."""
    h, w = output_size
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    lh, lw = unfold_shape(h, w, kernel, stride, padding)
    cnt = np.zeros((h + 2 * ph, w + 2 * pw, 1), np.float64)
    for ty in range(lh):
        for tx in range(lw):
            cnt[ty * sh: ty * sh + kh, tx * sw: tx * sw + kw] += 1.0
    return cnt[ph: ph + h, pw: pw + w]


def _mix_kernel(tok_ref, inv_ref, out_ref, *, lh, lw, kh, kw, sh, sw, ph,
                pw, h, w, c):
    tok = tok_ref[:].astype(jnp.float32)          # (1, lh, lw, kh*kw*c)
    patches = tok.reshape(lh, lw, kh, kw, c)

    # fold: phase-grouped shifted adds (static) — see ops.patches.fold
    jh = -(-kh // sh)
    jw = -(-kw // sw)
    slot_h = lh + jh - 1
    slot_w = lw + jw - 1
    rows = []
    for ry in range(sh):
        cols = []
        for rx in range(sw):
            acc = jnp.zeros((slot_h, slot_w, c), jnp.float32)
            for jy in range(jh):
                ki = ry + jy * sh
                if ki >= kh:
                    continue
                for jx in range(jw):
                    kj = rx + jx * sw
                    if kj >= kw:
                        continue
                    plane = patches[:, :, ki, kj, :]
                    acc = acc + jnp.pad(
                        plane, ((jy, slot_h - lh - jy),
                                (jx, slot_w - lw - jx), (0, 0)))
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=2))       # (Sh, Sw, sw, C)
    canvas = jnp.stack(rows, axis=1)               # (Sh, sh, Sw, sw, C)
    canvas = canvas.reshape(slot_h * sh, slot_w * sw, c)
    need_h, need_w = ph + h, pw + w
    canvas = jnp.pad(canvas,
                     ((0, max(0, need_h - canvas.shape[0])),
                      (0, max(0, need_w - canvas.shape[1])), (0, 0)))
    canvas = canvas[ph: ph + h, pw: pw + w, :]

    # overlap-normalize
    canvas = canvas * inv_ref[:]

    # unfold back (static strided slices of the padded canvas)
    cp = jnp.pad(canvas, ((ph, ph), (pw, pw), (0, 0)))
    outs = []
    for i in range(kh):
        row = []
        for j in range(kw):
            row.append(cp[i: i + (lh - 1) * sh + 1: sh,
                          j: j + (lw - 1) * sw + 1: sw, :])
        outs.append(jnp.stack(row, axis=2))        # (lh, lw, kw, c)
    out = jnp.stack(outs, axis=2)                  # (lh, lw, kh, kw, c)
    out_ref[:] = out.reshape(1, lh, lw, kh * kw * c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("output_size", "kernel",
                                             "stride", "padding",
                                             "interpret"))
def f3n_mix(tokens, output_size, kernel=(7, 7), stride=(3, 3),
            padding=(3, 3), interpret=False):
    """tokens: (N, lh, lw, kh*kw*c) -> same shape, F3N-mixed.

    Equivalent to unfold(fold(tokens)/fold(ones)) with torch semantics.
    """
    n, lh, lw, kc = tokens.shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    h, w = output_size
    c = kc // (kh * kw)
    assert (lh, lw) == unfold_shape(h, w, kernel, stride, padding)
    counts = _counts_np(output_size, kernel, stride, padding)
    inv = (1.0 / counts).astype(np.float32)

    kern = functools.partial(_mix_kernel, lh=lh, lw=lw, kh=kh, kw=kw,
                             sh=sh, sw=sw, ph=ph, pw=pw, h=h, w=w, c=c)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, lh, lw, kc),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, w, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, lh, lw, kc), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(tokens.shape, tokens.dtype),
        interpret=interpret,
    )(tokens, jnp.asarray(inv))
