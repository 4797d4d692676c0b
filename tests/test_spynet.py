"""Parity test: models.spynet vs an independent torch oracle.

The oracle below re-derives the SPyNet pyramid from its published definition
(Ranjan & Black 2017; 6 levels, avg-pool pyramid, warp + residual refine) and
the reference's resize-to-mult-of-32 protocol. It is test-only code.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import spynet

MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def torch_flow_warp_border(x, flow):
    n, _, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + flow
    gxn = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    gyn = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(x, torch.stack((gxn, gyn), 3), mode="bilinear",
                         padding_mode="border", align_corners=True)


def torch_spynet(weights, ref, supp):
    """weights: list of 6 modules, each list of 5 (w OIHW, b) torch tensors.
    ref/supp: (N, 3, H, W) in [0,1], H, W arbitrary."""
    h, w = ref.shape[2:]
    w_up = w if w % 32 == 0 else 32 * (w // 32 + 1)
    h_up = h if h % 32 == 0 else 32 * (h // 32 + 1)
    ref_u = F.interpolate(ref, size=(h_up, w_up), mode="bilinear",
                          align_corners=False)
    supp_u = F.interpolate(supp, size=(h_up, w_up), mode="bilinear",
                           align_corners=False)
    refs = [(ref_u - MEAN) / STD]
    supps = [(supp_u - MEAN) / STD]
    for _ in range(5):
        refs.append(F.avg_pool2d(refs[-1], 2, 2, count_include_pad=False))
        supps.append(F.avg_pool2d(supps[-1], 2, 2, count_include_pad=False))
    refs, supps = refs[::-1], supps[::-1]
    flow = torch.zeros(ref.shape[0], 2, h_up // 32, w_up // 32)
    for lvl in range(6):
        if lvl == 0:
            up = flow
        else:
            up = F.interpolate(flow, scale_factor=2, mode="bilinear",
                               align_corners=True) * 2.0
        warped = torch_flow_warp_border(supps[lvl], up.permute(0, 2, 3, 1))
        x = torch.cat([refs[lvl], warped, up], 1)
        for ci, (wt, bt) in enumerate(weights[lvl]):
            x = F.conv2d(x, wt, bt, padding=3)
            if ci < 4:
                x = F.relu(x)
        flow = up + x
    flow = F.interpolate(flow, size=(h, w), mode="bilinear",
                         align_corners=False)
    flow[:, 0] *= w / w_up
    flow[:, 1] *= h / h_up
    return flow


def test_spynet_parity(rng):
    params = spynet.init_params(jax.random.PRNGKey(0))
    # export params to torch layout
    weights = []
    for mod in params["modules"]:
        lvl = []
        for ci in range(5):
            w = np.asarray(mod[f"conv{ci}"]["w"]).transpose(3, 2, 0, 1)
            b = np.asarray(mod[f"conv{ci}"]["b"])
            lvl.append((torch.from_numpy(w.copy()),
                        torch.from_numpy(b.copy())))
        weights.append(lvl)

    ref = rng.uniform(0, 1, (2, 60, 108, 3)).astype(np.float32)
    supp = rng.uniform(0, 1, (2, 60, 108, 3)).astype(np.float32)

    with torch.no_grad():
        want = torch_spynet(
            weights,
            torch.from_numpy(np.moveaxis(ref, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(supp, -1, 1).copy()),
        ).numpy()
    got = np.asarray(jax.jit(spynet.spynet_flow)(
        params, jnp.asarray(ref), jnp.asarray(supp)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1),
                               rtol=2e-4, atol=2e-4)
