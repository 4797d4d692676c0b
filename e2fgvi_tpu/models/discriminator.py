"""Temporal PatchGAN discriminator (3D convs + spectral norm), JAX/NDHWC.

Re-design of the reference Discriminator (model/e2fgvi.py:271-344) and its
vendored spectral norm (model/modules/spectral_norm.py) in functional form:

- 6 conv3d stages, kernel (3,5,5), stride (1,2,2); the first conv pads 1 on
  every dim while the rest pad (1,2,2) (reference quirk, e2fgvi.py:287/296 —
  kept for checkpoint-shape compatibility); LeakyReLU(0.2) between stages;
  the last conv is not spectral-normalized and carries a bias.
- Spectral norm is a parameter transform with explicit power-iteration
  state (u vector per conv): `apply` returns (logits, new_state). torch
  updates u in-place during training forwards; here the caller threads the
  state (one power iteration per call when update=True).
"""

import jax
import jax.numpy as jnp

from e2fgvi_tpu.ops.convs import conv3d, leaky_relu

_NF = 32
_STAGES = [
    # (cin, cout, padding, spectral_norm)
    (3, _NF, (1, 1, 1), True),
    (_NF, _NF * 2, (1, 2, 2), True),
    (_NF * 2, _NF * 4, (1, 2, 2), True),
    (_NF * 4, _NF * 4, (1, 2, 2), True),
    (_NF * 4, _NF * 4, (1, 2, 2), True),
    (_NF * 4, _NF * 4, (1, 2, 2), False),
]
_EPS = 1e-12


def _l2normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v), _EPS)


def spectral_normalize(w, u, update: bool):
    """One torch-style power iteration on a conv weight.

    w: (..., cout) any conv kernel with output channels last.
    u: (cout,) left singular vector estimate.
    Returns (w / sigma, new_u).
    """
    cout = w.shape[-1]
    mat = w.reshape(-1, cout).T            # (cout, fan_in) — torch's view
    if update:
        v = _l2normalize(mat.T @ u)
        u = _l2normalize(mat @ v)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    else:
        v = _l2normalize(mat.T @ u)
    sigma = u @ (mat @ v)
    return w / sigma, u


def init_params(key, in_channels=3, dtype=jnp.float32):
    params = {"convs": [], "u": []}
    for i, (cin, cout, _, sn) in enumerate(_STAGES):
        key, k1, k2 = jax.random.split(key, 3)
        w = (jax.random.normal(k1, (3, 5, 5, cin, cout)) * 0.02).astype(dtype)
        conv = {"w": w}
        if not sn:
            conv["b"] = jnp.zeros((cout,), dtype)
        params["convs"].append(conv)
        params["u"].append(_l2normalize(
            jax.random.normal(k2, (cout,))).astype(dtype))
    return params


def apply(params, xs, update_stats: bool = False, use_sigmoid: bool = False):
    """xs: (B, T, H, W, 3) video clip -> (B, T', H', W', C) patch logits.

    Returns (logits, new_params) where new_params carries updated power-
    iteration state when update_stats=True.
    """
    x = xs  # NDHWC == (B, T, H, W, C)
    new_u = []
    for i, ((cin, cout, pad, sn), conv) in enumerate(
            zip(_STAGES, params["convs"])):
        w = conv["w"]
        u = params["u"][i]
        if sn:
            w, u = spectral_normalize(w, u, update_stats)
        new_u.append(u)
        x = conv3d(x, w, conv.get("b"), stride=(1, 2, 2), padding=pad)
        if i < len(_STAGES) - 1:
            x = leaky_relu(x, 0.2)
    if use_sigmoid:
        x = jax.nn.sigmoid(x)
    new_params = {"convs": params["convs"], "u": new_u}
    return x, new_params
