"""Minimal mmcv stand-in so the REFERENCE model code can run for golden
generation (scripts/make_golden.py) without mmcv installed.

Only the four symbols the reference imports are provided
(reference model/modules/feat_prop.py:7-8, flow_comp.py:7-8), implemented
independently with plain torch:

- `modulated_deform_conv2d` — DCNv2 via per-tap `F.grid_sample`
  (bilinear, zeros padding, align_corners=True), mathematically equal to
  mmcv's `dmcn_im2col_bilinear` + conv contraction for the configuration
  the reference uses (3x3, stride 1, pad 1, dilation 1, groups 1).
- `ModulatedDeformConv2d` — parameter-holding base module.
- `ConvModule` — conv (+ optional ReLU), conv stored as `.conv` to match
  the released checkpoints' key layout (`...basic_module.N.conv.weight`).
- `constant_init`, `load_checkpoint` (no-op: golden weights are set
  explicitly; this also disables SPyNet's construction-time URL download).

Install with `install()` BEFORE importing the reference model package.
"""

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def modulated_deform_conv2d(x, offset, mask, weight, bias, stride, padding,
                            dilation, groups, deform_groups):
    assert groups == 1 and dilation in (1, (1, 1)) and stride in (1, (1, 1))
    pad = padding if isinstance(padding, int) else padding[0]
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    g = deform_groups
    ho, wo = offset.shape[2], offset.shape[3]
    off = offset.view(b, g, kh * kw, 2, ho, wo)
    m = mask.view(b, g, kh * kw, ho, wo)
    xg = x.view(b * g, cin // g, h, w)
    ys, xs = torch.meshgrid(torch.arange(ho, dtype=x.dtype),
                            torch.arange(wo, dtype=x.dtype), indexing="ij")
    cols = []
    for k in range(kh * kw):
        ky, kx = k // kw, k % kw
        py = ys[None, None] - pad + ky + off[:, :, k, 0]
        px = xs[None, None] - pad + kx + off[:, :, k, 1]
        gy = 2.0 * py / (h - 1) - 1.0
        gx = 2.0 * px / (w - 1) - 1.0
        grid = torch.stack([gx, gy], dim=-1).view(b * g, ho, wo, 2)
        samp = F.grid_sample(xg, grid, mode="bilinear",
                             padding_mode="zeros", align_corners=True)
        cols.append(samp.view(b, g, cin // g, ho, wo) * m[:, :, k, None])
    cols = torch.stack(cols, dim=1)                      # (b,k,g,cg,ho,wo)
    cols = cols.reshape(b, kh * kw, cin, ho * wo)
    wk = weight.view(cout, cin, kh * kw)
    out = torch.einsum("bkcp,ock->bop", cols, wk).view(b, cout, ho, wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class ModulatedDeformConv2d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deform_groups=1,
                 bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size) \
            if isinstance(kernel_size, int) else kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deform_groups = deform_groups
        self.weight = nn.Parameter(torch.zeros(
            out_channels, in_channels // groups, *self.kernel_size))
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None


class ConvModule(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, norm_cfg=None, act_cfg=None):
        super().__init__()
        assert norm_cfg is None
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride, padding)
        self.activate = nn.ReLU() if act_cfg else None

    def forward(self, x):
        x = self.conv(x)
        return self.activate(x) if self.activate is not None else x


def constant_init(module, val, bias=0):
    nn.init.constant_(module.weight, val)
    if getattr(module, "bias", None) is not None:
        nn.init.constant_(module.bias, bias)


def load_checkpoint(model, path, strict=False, **kw):
    return None  # goldens set every weight explicitly; no URL fetches


def install():
    """Register fake mmcv modules in sys.modules."""
    mmcv = types.ModuleType("mmcv")
    ops = types.ModuleType("mmcv.ops")
    cnn = types.ModuleType("mmcv.cnn")
    runner = types.ModuleType("mmcv.runner")
    ops.ModulatedDeformConv2d = ModulatedDeformConv2d
    ops.modulated_deform_conv2d = modulated_deform_conv2d
    cnn.ConvModule = ConvModule
    cnn.constant_init = constant_init
    runner.load_checkpoint = load_checkpoint
    mmcv.ops, mmcv.cnn, mmcv.runner = ops, cnn, runner
    for name, mod in [("mmcv", mmcv), ("mmcv.ops", ops), ("mmcv.cnn", cnn),
                      ("mmcv.runner", runner)]:
        sys.modules[name] = mod
