"""NHWC / NDHWC convolution wrappers and small activations.

Thin, explicit wrappers over `lax.conv_general_dilated` with TPU-native
layouts (channel-last activations, HWIO kernels). Replaces torch
conv2d/conv3d/leaky_relu/LayerNorm usage throughout the reference L2 layer.
"""

import jax
import jax.numpy as jnp
from jax import lax


def _norm(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


def conv2d(x, w, b=None, stride=1, padding=0, groups=1, dilation=1):
    """x: (N, H, W, Cin), w: (kh, kw, Cin/groups, Cout), b: (Cout,)."""
    s = _norm(stride, 2)
    p = _norm(padding, 2)
    d = _norm(dilation, 2)
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=s,
        padding=((p[0], p[0]), (p[1], p[1])),
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv3d(x, w, b=None, stride=1, padding=0):
    """x: (N, D, H, W, Cin), w: (kd, kh, kw, Cin, Cout).

    padding: int | (pd, ph, pw) | explicit ((lo,hi),)*3.
    """
    s = _norm(stride, 3)
    if isinstance(padding, int):
        p = ((padding, padding),) * 3
    elif len(padding) == 3 and isinstance(padding[0], int):
        p = tuple((v, v) for v in padding)
    else:
        p = tuple(padding)
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=s,
        padding=p,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def layer_norm(x, gamma, beta, eps=1e-5):
    """LayerNorm over the last axis (torch nn.LayerNorm default eps)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mu) * lax.rsqrt(var + eps) * gamma + beta
    return out.astype(x.dtype)


def linear(x, w, b=None):
    """x: (..., Cin), w: (Cin, Cout) — note: transposed vs torch Linear."""
    out = jnp.einsum("...i,io->...o", x, w,
                     preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def gelu(x):
    """Exact (erf-based) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)
