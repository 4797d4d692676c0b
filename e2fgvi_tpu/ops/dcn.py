"""Modulated deformable convolution (DCNv2), TPU-native.

Replaces mmcv's CUDA ``modulated_deform_conv2d`` (reference
model/modules/feat_prop.py:7,55-58 — 3x3, stride 1, pad 1, dilation 1,
deform_groups=16, groups=1) with a gather + single-GEMM formulation:

1. bilinear-sample every kernel tap at its offset position (4 corner gathers
   over the flattened spatial axis, per deform group),
2. scale by the sigmoid modulation mask,
3. contract taps x input-channels against the 3x3 weight in ONE
   (N*H*W, K*Cin) x (K*Cin, Cout) matmul on the MXU.

Sampling semantics match mmcv's `dmcn_im2col_bilinear`: a tap contributes
each of its 4 integer corners only when that corner is inside the image
(zero padding outside), i.e. identical to grid_sample zeros-mode taps.

A Pallas kernel can be slotted behind the same signature later; this XLA
formulation is the correctness oracle and the autodiff path.
"""

import jax.numpy as jnp


def modulated_deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray,
                            mask: jnp.ndarray, w: jnp.ndarray,
                            b: jnp.ndarray | None = None,
                            padding: int = 1) -> jnp.ndarray:
    """Apply DCNv2 with stride 1, dilation 1, groups 1.

    Args:
      x: (N, H, W, Cin) input features.
      offset: (N, H, W, G, K, 2) per-deform-group, per-tap offsets,
        last dim (dy, dx) in pixels.
      mask: (N, H, W, G, K) modulation scalars (already sigmoided).
      w: (kh, kw, Cin, Cout) conv weight, HWIO.
      b: (Cout,) bias or None.
      padding: spatial padding of the underlying conv (output is same-size
        for the 3x3/pad-1 case used by E2FGVI).
    Returns:
      (N, Ho, Wo, Cout) with Ho = H + 2*padding - kh + 1 (stride 1).
    """
    n, h, wdt, cin = x.shape
    kh, kw, wcin, cout = w.shape
    g = offset.shape[3]
    k = kh * kw
    assert wcin == cin and offset.shape[4] == k and mask.shape[3:] == (g, k)
    assert cin % g == 0
    cg = cin // g
    ho = h + 2 * padding - kh + 1
    wo = wdt + 2 * padding - kw + 1
    assert (ho, wo) == (offset.shape[1], offset.shape[2])

    dtype = x.dtype
    off = offset.astype(jnp.float32)

    # Base sampling positions: p = out_pos - pad + kernel_pos + offset
    ky = jnp.repeat(jnp.arange(kh, dtype=jnp.float32), kw)   # (K,) tap row
    kx = jnp.tile(jnp.arange(kw, dtype=jnp.float32), kh)     # (K,) tap col
    base_y = (jnp.arange(ho, dtype=jnp.float32)[:, None] - padding
              + ky[None, :])                                 # (Ho, K)
    base_x = (jnp.arange(wo, dtype=jnp.float32)[:, None] - padding
              + kx[None, :])                                 # (Wo, K)
    py = base_y[None, :, None, None, :] + off[..., 0]        # (N,Ho,Wo,G,K)
    px = base_x[None, None, :, None, :] + off[..., 1]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0
    wx1 = px - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    xg = x.reshape(n, h * wdt, g, cg)

    def corner(yc, xc):
        valid = ((yc >= 0) & (yc <= h - 1) & (xc >= 0) &
                 (xc <= wdt - 1))
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, wdt - 1).astype(jnp.int32)
        flat = yi * wdt + xi                                 # (N,Ho,Wo,G,K)
        idx = flat.transpose(0, 1, 2, 4, 3).reshape(n, ho * wo * k, g, 1)
        vals = jnp.take_along_axis(xg, idx, axis=1)          # (N,HWK,G,Cg)
        vmask = valid.transpose(0, 1, 2, 4, 3).reshape(n, ho * wo * k, g, 1)
        return vals * vmask.astype(vals.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1.0)
    v10 = corner(y0 + 1.0, x0)
    v11 = corner(y0 + 1.0, x0 + 1.0)

    def bw(wy, wx):
        return (wy * wx).transpose(0, 1, 2, 4, 3).reshape(
            n, ho * wo * k, g, 1)

    sampled = (v00 * bw(wy0, wx0) + v01 * bw(wy0, wx1) +
               v10 * bw(wy1, wx0) + v11 * bw(wy1, wx1))      # (N,HWK,G,Cg)

    m = mask.astype(jnp.float32).transpose(0, 1, 2, 4, 3).reshape(
        n, ho * wo * k, g, 1)
    sampled = sampled * m

    # (N, Ho*Wo, K, Cin) -> one GEMM against (K*Cin, Cout)
    sampled = sampled.reshape(n, ho * wo, k, cin)
    wk = w.reshape(k * cin, cout)  # HWIO flattens as (kh, kw, cin) = (k, cin)
    out = jnp.einsum("npi,io->npo", sampled.reshape(n, ho * wo, k * cin),
                     wk, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.reshape(n, ho, wo, cout).astype(dtype)
