"""Backward warping (grid_sample) with exact PyTorch semantics.

Replaces torch ``F.grid_sample`` (ATen CUDA; reference
model/modules/flow_comp.py:345-383) for the two modes E2FGVI uses:

- bilinear, align_corners=True, padding 'zeros'   (feature propagation)
- bilinear, align_corners=True, padding 'border'  (SPyNet pyramid warp)

Implementation: ONE 2x2xC block gather per output pixel (TPU gathers are
row-bound, so fetching the four bilinear corners as a single block is 4x
fewer gather rows than four flat gathers) + relu(1-|p-r|) corner weights,
which reproduce both padding modes' boundary behavior with no masks.
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
    from e2fgvi_tpu.ops.dcn import bilinear_block_sample

    n, h, w, c = x.shape
    ho, wo = grid.shape[1], grid.shape[2]
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # align_corners=True unnormalize
    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)

    if padding_mode == "border":
        # clamping the coordinate makes the clamped-corner weights sum to 1
        ix = jnp.clip(ix, 0.0, float(w - 1))
        iy = jnp.clip(iy, 0.0, float(h - 1))
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    out = bilinear_block_sample(x, iy.reshape(n, ho * wo),
                                ix.reshape(n, ho * wo))
    return out.reshape(n, ho, wo, c).astype(x.dtype)


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
