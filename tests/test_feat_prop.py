"""Parity test: models.feat_prop vs a torch+numpy oracle.

The oracle mirrors the reference propagation bookkeeping
(feat_prop.py:61-149) — reversed frame order for the backward branch,
step-counter flow indexing (flow_idx = range(-1, t-1)), second-order state,
offset head with tanh-bounded residuals added to the (dy, dx)-swapped flow —
using torch convs and the validated numpy DCNv2 oracle from test_ops_dcn.
Channel count is scaled down (32ch, 16 deform groups) to keep the python
DCN oracle fast.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import feat_prop
from test_ops_dcn import dcn_numpy

C = 32
G = 16
T = 4
H, W = 10, 12
B = 1


def _mk_conv(rng, kh, kw, cin, cout, scale=0.02):
    return {
        "w": jnp.asarray((rng.standard_normal((kh, kw, cin, cout)) * scale
                          ).astype(np.float32)),
        "b": jnp.asarray((rng.standard_normal(cout) * 0.1
                          ).astype(np.float32)),
    }


def _params(rng):
    p = {}
    for i, d in enumerate(("backward", "forward")):
        p[d] = {
            "deform": {
                **_mk_conv(rng, 3, 3, 2 * C, C),
                "conv_offset": [
                    _mk_conv(rng, 3, 3, 3 * C + 4, C),
                    _mk_conv(rng, 3, 3, C, C),
                    _mk_conv(rng, 3, 3, C, C),
                    _mk_conv(rng, 3, 3, C, 27 * G, scale=0.02),
                ],
            },
            "backbone": [
                _mk_conv(rng, 3, 3, (2 + i) * C, C),
                _mk_conv(rng, 3, 3, C, C),
            ],
        }
    p["fusion"] = _mk_conv(rng, 1, 1, 2 * C, C)
    return p


def _tconv(p, x, pad=1):
    w = torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
    b = torch.from_numpy(np.asarray(p["b"]).copy())
    return F.conv2d(x, w, b, padding=pad)


def _twarp(x, flow, mode="zeros"):
    n, _, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + flow
    gxn = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    gyn = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(x, torch.stack((gxn, gyn), 3), mode="bilinear",
                         padding_mode=mode, align_corners=True)


def _oracle_deform_align(p, x, cond, flow1, flow2):
    feat = torch.cat([cond, flow1, flow2], 1)
    for i, cp in enumerate(p["conv_offset"]):
        feat = _tconv(cp, feat)
        if i < 3:
            feat = F.leaky_relu(feat, 0.1)
    o1, o2, m = feat.chunk(3, dim=1)
    off = 10.0 * torch.tanh(torch.cat((o1, o2), 1))
    off1, off2 = off.chunk(2, dim=1)
    off1 = off1 + flow1.flip(1).repeat(1, off1.size(1) // 2, 1, 1)
    off2 = off2 + flow2.flip(1).repeat(1, off2.size(1) // 2, 1, 1)
    offset = torch.cat([off1, off2], 1)         # (N, 2*9*G, H, W)
    mask = torch.sigmoid(m)                     # (N, 9*G, H, W)
    # to numpy-oracle layout: offset (N,H,W,G,9,2)(dy,dx), mask (N,H,W,G,9)
    n = x.shape[0]
    offn = offset.permute(0, 2, 3, 1).numpy().reshape(n, H, W, G, 9, 2)
    maskn = mask.permute(0, 2, 3, 1).numpy().reshape(n, H, W, G, 9)
    xn = x.permute(0, 2, 3, 1).numpy()
    wn = np.asarray(p["w"])
    bn = np.asarray(p["b"])
    out = dcn_numpy(xn.astype(np.float64), offn, maskn, wn, bn)
    return torch.from_numpy(np.moveaxis(out, -1, 1)).float()


def _oracle(params, x, flows_b, flows_f):
    spatial = [x[:, i] for i in range(T)]
    feats = {}
    for d in ("backward", "forward"):
        p = params[d]
        order = list(range(T - 1, -1, -1)) if d == "backward" else list(
            range(T))
        flows = flows_b if d == "backward" else flows_f
        outs = []
        prop = torch.zeros(B, C, H, W)
        for i, idx in enumerate(order):
            cur = spatial[idx]
            if i > 0:
                f1 = flows[:, i - 1]
                c1 = _twarp(prop, f1.permute(0, 2, 3, 1))
                f2 = torch.zeros_like(f1)
                n2 = torch.zeros_like(prop)
                c2 = torch.zeros_like(c1)
                if i > 1:
                    n2 = outs[-2]
                    f2 = flows[:, i - 2]
                    f2 = f1 + _twarp(f2, f1.permute(0, 2, 3, 1))
                    c2 = _twarp(n2, f2.permute(0, 2, 3, 1))
                cond = torch.cat([c1, cur, c2], 1)
                stacked = torch.cat([prop, n2], 1)
                prop = _oracle_deform_align(p["deform"], stacked, cond, f1,
                                            f2)
            if d == "backward":
                feat = torch.cat([cur, prop], 1)
            else:
                feat = torch.cat([cur, feats["backward"][idx], prop], 1)
            r = F.leaky_relu(_tconv(p["backbone"][0], feat), 0.1)
            r = _tconv(p["backbone"][1], r)
            prop = prop + r
            outs.append(prop)
        feats[d] = outs[::-1] if d == "backward" else outs
    fused = []
    for i in range(T):
        cat = torch.cat([feats["backward"][i], feats["forward"][i]], 1)
        fused.append(_tconv(params["fusion"], cat, pad=0))
    return torch.stack(fused, 1) + x


def test_feat_prop_parity(rng):
    params = _params(rng)
    x = rng.standard_normal((B, T, H, W, C), dtype=np.float32)
    fb = (rng.standard_normal((B, T - 1, H, W, 2)) * 2).astype(np.float32)
    ff = (rng.standard_normal((B, T - 1, H, W, 2)) * 2).astype(np.float32)

    got = np.asarray(jax.jit(feat_prop.bidirectional_propagation)(
        params, jnp.asarray(x), jnp.asarray(fb), jnp.asarray(ff)))

    with torch.no_grad():
        want = _oracle(
            params,
            torch.from_numpy(x.transpose(0, 1, 4, 2, 3).copy()),
            torch.from_numpy(fb.transpose(0, 1, 4, 2, 3).copy()),
            torch.from_numpy(ff.transpose(0, 1, 4, 2, 3).copy()),
        ).numpy()
    want = want.transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
