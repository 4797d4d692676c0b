"""Backward warping (grid_sample) with exact PyTorch semantics.

Replaces torch ``F.grid_sample`` (ATen CUDA; reference
model/modules/flow_comp.py:345-383) for the two modes E2FGVI uses:

- bilinear, align_corners=True, padding 'zeros'   (feature propagation)
- bilinear, align_corners=True, padding 'border'  (SPyNet pyramid warp)

Implementation: four flat gathers (`take_along_axis` over flattened spatial
dim) + bilinear blend. Gathers on TPU lower to XLA dynamic-gather over the
minor dimensions; the blend fuses with downstream elementwise work. A Pallas
variant can be slotted behind the same signature if profiling demands it.
"""

import jax.numpy as jnp


def grid_sample_bilinear(x: jnp.ndarray, grid: jnp.ndarray,
                         padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample channel-last images at normalized grid locations.

    Args:
      x: (N, H, W, C) input.
      grid: (N, Ho, Wo, 2) normalized coords in [-1, 1], last dim (gx, gy)
        where gx indexes W and gy indexes H (torch convention).
      padding_mode: 'zeros' or 'border'.
    Returns:
      (N, Ho, Wo, C), align_corners=True semantics.
    """
    n, h, w, c = x.shape
    ho, wo = grid.shape[1], grid.shape[2]
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # align_corners=True unnormalize
    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, float(w - 1))
        iy = jnp.clip(iy, 0.0, float(h - 1))
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    def tap(yc, xc):
        if padding_mode == "zeros":
            valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) &
                     (yc <= h - 1)).astype(jnp.float32)
        else:
            valid = None
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        flat = (yi * w + xi).reshape(n, ho * wo, 1)
        vals = jnp.take_along_axis(
            x.reshape(n, h * w, c), flat, axis=1).reshape(n, ho, wo, c)
        if valid is not None:
            vals = vals * valid[..., None]
        return vals

    v00 = tap(y0, x0)
    v01 = tap(y0, x1)
    v10 = tap(y1, x0)
    v11 = tap(y1, x1)

    out = (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None] +
           v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])
    return out.astype(x.dtype)


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray,
              padding_mode: str = "zeros") -> jnp.ndarray:
    """Warp channel-last images by a dense flow field.

    Mirrors reference flow_warp (flow_comp.py:345-383): builds the identity
    pixel grid, adds the flow (pixels, (dx, dy) order in the last dim),
    normalizes to [-1, 1] with align_corners=True, then bilinear-samples.

    Args:
      x: (N, H, W, C).
      flow: (N, H, W, 2), last dim (dx, dy) in pixels.
    """
    n, h, w, _ = x.shape
    assert flow.shape[1] == h and flow.shape[2] == w, (x.shape, flow.shape)
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    fx = gx + flow[..., 0].astype(jnp.float32)
    fy = gy + flow[..., 1].astype(jnp.float32)
    nx = 2.0 * fx / max(w - 1, 1) - 1.0
    ny = 2.0 * fy / max(h - 1, 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample_bilinear(x, grid, padding_mode=padding_mode)
