"""Golden tests: ops.warp vs torch F.grid_sample (both padding modes)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from e2fgvi_tpu.ops.warp import grid_sample_bilinear, flow_warp


@pytest.mark.parametrize("pad", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, pad):
    n, h, w, c = 2, 15, 27, 4
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    # include far out-of-range coords to exercise padding behavior
    grid = rng.uniform(-1.7, 1.7, size=(n, 10, 12, 2)).astype(np.float32)
    ref = F.grid_sample(
        torch.from_numpy(np.moveaxis(x, -1, 1)), torch.from_numpy(grid),
        mode="bilinear", padding_mode=pad, align_corners=True)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    got = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid),
                                          padding_mode=pad))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad", ["zeros", "border"])
def test_flow_warp_matches_reference_formula(rng, pad):
    """flow_warp = grid(+flow) normalized then grid_sample (flow_comp.py:345-383)."""
    n, h, w, c = 2, 60, 108, 3
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    flow = (rng.standard_normal((n, h, w, 2)) * 8).astype(np.float32)

    # independent torch oracle following the reference formula
    t_x = torch.from_numpy(np.moveaxis(x, -1, 1))
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()
    gf = grid[None] + torch.from_numpy(flow)
    gfx = 2.0 * gf[..., 0] / max(w - 1, 1) - 1.0
    gfy = 2.0 * gf[..., 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(t_x, torch.stack((gfx, gfy), dim=3),
                        mode="bilinear", padding_mode=pad,
                        align_corners=True)
    ref = np.moveaxis(ref.numpy(), 1, -1)

    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow),
                               padding_mode=pad))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
