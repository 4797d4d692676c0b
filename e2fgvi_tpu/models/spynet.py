"""SPyNet optical-flow estimator (coarse-to-fine spatial pyramid), JAX/NHWC.

Functional re-design of the reference flow-completion network
(model/modules/flow_comp.py:49-226): 6 pyramid levels, each refined by a
5-conv (7x7) residual module on [ref, warp(supp, flow_up), flow_up].

Differences from the reference by design:
- NHWC throughout; flow is (N, H, W, 2) with (dx, dy) channels last.
- No network I/O at construction (the reference downloads pretrained SPyNet
  weights from an openmmlab URL at __init__, flow_comp.py:59-72); pretrained
  weights arrive via the checkpoint converter instead.
- The pyramid is unrolled at trace time (static level count) so XLA sees one
  fused graph per input shape.
"""

import jax
import jax.numpy as jnp
import numpy as np

from e2fgvi_tpu.ops.convs import conv2d
from e2fgvi_tpu.ops.resize import resize_bilinear, avg_pool_2x2
from e2fgvi_tpu.ops.warp import flow_warp

# ImageNet normalization constants (reference flow_comp.py:77-82 buffers).
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

_LEVELS = 6
# per-module conv channel plan: in -> out, kernel 7, pad 3
_CHANNELS = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]


def init_params(key, dtype=jnp.float32):
    """Random init (for training-from-scratch); pretrained via convert/."""
    params = {"modules": []}
    for _ in range(_LEVELS):
        mod = {}
        for ci, (cin, cout) in enumerate(_CHANNELS):
            key, k1 = jax.random.split(key)
            std = float(np.sqrt(2.0 / (7 * 7 * cin)))
            mod[f"conv{ci}"] = {
                "w": (jax.random.normal(k1, (7, 7, cin, cout)) * std
                      ).astype(dtype),
                "b": jnp.zeros((cout,), dtype),
            }
        params["modules"].append(mod)
    return params


def _basic_module(mod, x):
    for ci in range(len(_CHANNELS)):
        p = mod[f"conv{ci}"]
        x = conv2d(x, p["w"], p["b"], stride=1, padding=3)
        if ci < len(_CHANNELS) - 1:
            x = jax.nn.relu(x)
    return x


def _compute_flow(params, ref, supp):
    """ref/supp (N, H, W, 3) with H, W multiples of 32, values [0, 1]."""
    n, h, w, _ = ref.shape
    # normalization constants in the COMPUTE dtype: an f32 constant here
    # silently promotes the whole pyramid (and every 7x7 conv) to f32 —
    # measured 445 ms vs 30 ms per 70-pair chunk on v5e (scripts/
    # exp_spynet3.py). f32 runs are unaffected (constants stay f32).
    mean = jnp.asarray(_MEAN, ref.dtype)
    std = jnp.asarray(_STD, ref.dtype)
    refs = [(ref - mean) / std]
    supps = [(supp - mean) / std]
    for _ in range(5):
        refs.append(avg_pool_2x2(refs[-1]))
        supps.append(avg_pool_2x2(supps[-1]))
    refs = refs[::-1]
    supps = supps[::-1]

    flow = jnp.zeros((n, h // 32, w // 32, 2), ref.dtype)
    for level in range(_LEVELS):
        if level == 0:
            flow_up = flow
        else:
            fh, fw = flow.shape[1], flow.shape[2]
            flow_up = resize_bilinear(flow, 2 * fh, 2 * fw,
                                      align_corners=True) * 2.0
        warped = flow_warp(supps[level], flow_up, padding_mode="border")
        inp = jnp.concatenate([refs[level], warped, flow_up], axis=-1)
        flow = flow_up + _basic_module(params["modules"][level], inp)
    return flow


def spynet_flow(params, ref, supp):
    """Flow from ref to supp. ref/supp (N, H, W, 3) in [0, 1].

    Returns (N, H, W, 2) flow in pixels, (dx, dy) channels.
    Reproduces the reference resize-to-mult-of-32 protocol
    (flow_comp.py:136-169): upsize with align_corners=False, compute, resize
    back, rescale flow magnitudes by the size ratio.
    """
    h, w = ref.shape[1], ref.shape[2]
    w_up = w if w % 32 == 0 else 32 * (w // 32 + 1)
    h_up = h if h % 32 == 0 else 32 * (h // 32 + 1)
    ref_u = resize_bilinear(ref, h_up, w_up, align_corners=False)
    supp_u = resize_bilinear(supp, h_up, w_up, align_corners=False)
    flow = _compute_flow(params, ref_u, supp_u)
    flow = resize_bilinear(flow, h, w, align_corners=False)
    scale = jnp.asarray([w / w_up, h / h_up], jnp.float32)
    return flow * scale
