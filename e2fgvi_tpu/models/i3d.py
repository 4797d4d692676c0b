"""Inception-v1 I3D feature extractor for VFID, JAX/NDHWC.

Re-design of the reference's vendored pytorch-i3d (core/metrics.py:196-570)
as a functional JAX model. Only the inference path needed for VFID is built:
stem convs/pools -> Mixed_3b..Mixed_5c -> global average pool over (T, H, W)
(the reference's extract_features with target 'Logits' never enters the
logits head — it mean-pools Mixed_5c, metrics.py:561-570).

TF-style 'same' padding is computed per input shape (static under jit),
matching the reference's compute_pad (metrics.py:196-219, 259-280).
BatchNorm runs in eval mode (running stats folded in).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from e2fgvi_tpu.ops.convs import conv3d

# (name, kind, spec)
# conv spec: (cin, cout, (kd,kh,kw), (sd,sh,sw), use_bn)
# pool spec: ((kd,kh,kw), (sd,sh,sw))
_STEM = [
    ("Conv3d_1a_7x7", "conv", (3, 64, (7, 7, 7), (2, 2, 2))),
    ("MaxPool3d_2a_3x3", "pool", ((1, 3, 3), (1, 2, 2))),
    ("Conv3d_2b_1x1", "conv", (64, 64, (1, 1, 1), (1, 1, 1))),
    ("Conv3d_2c_3x3", "conv", (64, 192, (3, 3, 3), (1, 1, 1))),
    ("MaxPool3d_3a_3x3", "pool", ((1, 3, 3), (1, 2, 2))),
]

# inception module output channel plans (reference metrics.py:450-518)
_MIXED = [
    ("Mixed_3b", 192, [64, 96, 128, 16, 32, 32]),
    ("Mixed_3c", 256, [128, 128, 192, 32, 96, 64]),
    ("MaxPool3d_4a_3x3", None, ((3, 3, 3), (2, 2, 2))),
    ("Mixed_4b", 480, [192, 96, 208, 16, 48, 64]),
    ("Mixed_4c", 512, [160, 112, 224, 24, 64, 64]),
    ("Mixed_4d", 512, [128, 128, 256, 24, 64, 64]),
    ("Mixed_4e", 512, [112, 144, 288, 32, 64, 64]),
    ("Mixed_4f", 528, [256, 160, 320, 32, 128, 128]),
    ("MaxPool3d_5a_2x2", None, ((2, 2, 2), (2, 2, 2))),
    ("Mixed_5b", 832, [256, 160, 320, 32, 128, 128]),
    ("Mixed_5c", 832, [384, 192, 384, 48, 128, 128]),
]


def _same_pad(size, kernel, stride):
    """TF-style same padding per dim (reference compute_pad)."""
    if size % stride == 0:
        pad = max(kernel - stride, 0)
    else:
        pad = max(kernel - (size % stride), 0)
    return (pad // 2, pad - pad // 2)


def _unit3d(p, x, kernel, stride, use_bn=True, relu=True):
    pads = tuple(_same_pad(x.shape[1 + i], kernel[i], stride[i])
                 for i in range(3))
    x = conv3d(x, p["w"], p.get("b"), stride=stride, padding=pads)
    if use_bn:
        x = (x - p["bn_mean"]) * p["bn_scale"] + p["bn_bias"]
    if relu:
        x = jax.nn.relu(x)
    return x


def _maxpool_same(x, kernel, stride):
    pads = tuple(_same_pad(x.shape[1 + i], kernel[i], stride[i])
                 for i in range(3))
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding=((0, 0), *pads, (0, 0)))


def _inception(p, x):
    b0 = _unit3d(p["b0"], x, (1, 1, 1), (1, 1, 1))
    b1 = _unit3d(p["b1a"], x, (1, 1, 1), (1, 1, 1))
    b1 = _unit3d(p["b1b"], b1, (3, 3, 3), (1, 1, 1))
    b2 = _unit3d(p["b2a"], x, (1, 1, 1), (1, 1, 1))
    b2 = _unit3d(p["b2b"], b2, (3, 3, 3), (1, 1, 1))
    b3 = _maxpool_same(x, (3, 3, 3), (1, 1, 1))
    b3 = _unit3d(p["b3b"], b3, (1, 1, 1), (1, 1, 1))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_trunk(params, video):
    """video: (B, T, H, W, 3) in [0, 1]. Returns the pre-pool Mixed_5c
    map (B, T', H', W', 1024), T' = ceil(T/8) (three temporal stride-2s)."""
    x = video
    for name, kind, spec in _STEM:
        if kind == "conv":
            cin, cout, k, s = spec
            x = _unit3d(params[name], x, k, s)
        else:
            x = _maxpool_same(x, *spec)
    for name, cin, spec in _MIXED:
        if cin is None:
            x = _maxpool_same(x, *spec)
        else:
            x = _inception(params[name], x)
    return x


def i3d_features(params, video):
    """video: (B, T, H, W, 3) in [0, 1] (the reference feeds [0,1], not
    [-1,1] — metrics.py:71-83). Returns (B, 1024) mean-pooled Mixed_5c."""
    return i3d_trunk(params, video).mean(axis=(1, 2, 3))


def i3d_features_masked(params, video, valid_t):
    """i3d_features over only the first `valid_t` input frames' outputs.

    For T-bucketed evaluation: videos are edge-padded in T to a small
    bucket set so XLA compiles one program per bucket instead of one per
    unique video length (reference evaluate.py:128-133 runs the exact
    length, which recompiles per video on a jit backend). The temporal
    axis is downsampled 8x by the trunk, so output frames at index
    >= ceil(valid_t/8) come entirely from padding and are masked out of
    the mean. Caveat: Mixed_5c's temporal receptive field spans ~100
    input frames, so the freeze-frame padding still reaches the kept
    outputs — per-video features are APPROXIMATE (exact only when the
    video length equals its bucket). VFID itself stays meaningful: real
    and composited videos of the same clip get the identical padded
    transform, so the Frechet comparison is between consistently-computed
    distributions. For bit-parity with the reference's published VFID,
    run `cli/evaluate.py --i3d_exact` (one compile per distinct length).

    valid_t: () int32, the real frame count. video: (B, bucket, H, W, 3).
    """
    fmap = i3d_trunk(params, video)              # (B, T', H', W', 1024)
    tprime = fmap.shape[1]
    nvalid = (valid_t + 7) // 8
    keep = (jnp.arange(tprime) < nvalid)[None, :, None, None, None]
    denom = nvalid * fmap.shape[2] * fmap.shape[3]
    return jnp.where(keep, fmap, 0.0).sum(axis=(1, 2, 3)) / denom


# --- torch checkpoint conversion -------------------------------------------

def _convert_unit(sd, prefix, bn=True):
    w = np.asarray(sd[f"{prefix}.conv3d.weight"])
    p = {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}
    if f"{prefix}.conv3d.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{prefix}.conv3d.bias"]))
    if bn:
        gamma = np.asarray(sd[f"{prefix}.bn.weight"])
        beta = np.asarray(sd[f"{prefix}.bn.bias"])
        mean = np.asarray(sd[f"{prefix}.bn.running_mean"])
        var = np.asarray(sd[f"{prefix}.bn.running_var"])
        eps = 1e-3  # reference BatchNorm3d(eps=0.001), metrics.py:255-257
        scale = gamma / np.sqrt(var + eps)
        p["bn_mean"] = jnp.asarray(mean)
        p["bn_scale"] = jnp.asarray(scale)
        p["bn_bias"] = jnp.asarray(beta)
    return p


def convert_i3d(sd):
    """torch i3d_rgb_imagenet.pt state dict -> params pytree."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    params = {}
    for name, kind, _ in _STEM:
        if kind == "conv":
            params[name] = _convert_unit(sd, name)
    for name, cin, _ in _MIXED:
        if cin is None:
            continue
        params[name] = {
            "b0": _convert_unit(sd, f"{name}.b0"),
            "b1a": _convert_unit(sd, f"{name}.b1a"),
            "b1b": _convert_unit(sd, f"{name}.b1b"),
            "b2a": _convert_unit(sd, f"{name}.b2a"),
            "b2b": _convert_unit(sd, f"{name}.b2b"),
            "b3b": _convert_unit(sd, f"{name}.b3b"),
        }
    return params


def load_i3d(path):
    import torch
    return convert_i3d(torch.load(path, map_location="cpu"))


def init_params(key, dtype=jnp.float32):
    """Random-weight I3D (for tests / smoke runs without the checkpoint)."""
    def unit(key, cin, cout, k):
        k1, _ = jax.random.split(key)
        std = float(np.sqrt(2.0 / (np.prod(k) * cin)))
        return {
            "w": (jax.random.normal(k1, (*k, cin, cout)) * std).astype(dtype),
            "bn_mean": jnp.zeros((cout,), dtype),
            "bn_scale": jnp.ones((cout,), dtype),
            "bn_bias": jnp.zeros((cout,), dtype),
        }

    params = {}
    for name, kind, spec in _STEM:
        if kind == "conv":
            cin, cout, k, s = spec
            key, sub = jax.random.split(key)
            params[name] = unit(sub, cin, cout, k)
    for name, cin, spec in _MIXED:
        if cin is None:
            continue
        o = spec
        key, *subs = jax.random.split(key, 7)
        params[name] = {
            "b0": unit(subs[0], cin, o[0], (1, 1, 1)),
            "b1a": unit(subs[1], cin, o[1], (1, 1, 1)),
            "b1b": unit(subs[2], o[1], o[2], (3, 3, 3)),
            "b2a": unit(subs[3], cin, o[3], (1, 1, 1)),
            "b2b": unit(subs[4], o[3], o[4], (3, 3, 3)),
            "b3b": unit(subs[5], cin, o[5], (1, 1, 1)),
        }
    return params
