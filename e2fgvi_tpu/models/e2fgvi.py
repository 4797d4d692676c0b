"""E2FGVI inpainting generator (base + HQ unified), JAX/NHWC.

Functional re-design of the reference InpaintGenerator
(model/e2fgvi.py:133-263 / model/e2fgvi_hq.py:134-263):

  flow pre-pass (SPyNet at 1/4 res, both directions on local frames)
  -> encoder (strided convs + group-fusion re-concats)
  -> bidirectional flow-guided deformable propagation on local features
  -> soft split -> 8 temporal focal transformer blocks -> soft composition
  -> residual add -> decoder (2x bilinear-up + conv, twice) -> tanh

The base and HQ variants share one code path here: the generator takes the
feature-map `output_size` from the runtime shape (the HQ behavior); the base
model is the special case output_size == (60, 108) with a learned
soft-composition bias map instead of the HQ bias conv. `variant` selects
which soft-comp parameters exist.

Everything is shape-static per (B, T, H, W): jit once per window bucket.
"""


import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import feat_prop, spynet, tfocal
from e2fgvi_tpu.ops.convs import conv2d, leaky_relu
from e2fgvi_tpu.ops.resize import resize_scale_quarter, resize_scale2_aligned

CHANNEL = 256
HIDDEN = 512
DEPTHS = 8
NUM_HEADS = 4
WINDOW_SIZE = (5, 9)
FOCAL_LEVEL = 2

# Encoder conv plan: (cin, cout, stride, groups). After conv 4 (the 384-ch
# layer) the 256-ch activation is re-concatenated group-interleaved before
# each later conv (reference Encoder, model/e2fgvi.py:71-109).
_ENC_PLAN = [
    (3, 64, 2, 1),
    (64, 64, 1, 1),
    (64, 128, 2, 1),
    (128, 256, 1, 1),
    (256, 384, 1, 1),
    (640, 512, 1, 2),
    (768, 384, 1, 4),
    (640, 256, 1, 8),
    (512, 128, 1, 1),
]
_ENC_FUSE_GROUPS = {5: 2, 6: 4, 7: 8, 8: 1}

_DEC_PLAN = [
    ("deconv", 128, 128),
    ("conv", 128, 64),
    ("deconv", 64, 64),
    ("conv", 64, 3),
]


def _conv_init(key, kh, kw, cin, cout, gain=0.02, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    return {"w": (jax.random.normal(k1, (kh, kw, cin, cout)) * gain
                  ).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def init_params(key, variant="base", dtype=jnp.float32):
    """Build the full generator parameter pytree.

    variant: 'base' (fixed 432x240, learned sc bias map) or 'hq'
    (arbitrary resolution, sc bias conv).
    """
    keys = jax.random.split(key, 16 + DEPTHS)
    enc = [
        _conv_init(keys[i], 3, 3, cin // g, cout, dtype=dtype)
        for i, (cin, cout, s, g) in enumerate(_ENC_PLAN)
    ]
    dec = [
        _conv_init(keys[9 + i], 3, 3, cin, cout, dtype=dtype)
        for i, (_, cin, cout) in enumerate(_DEC_PLAN)
    ]
    kh, kw = tfocal.T2T_KERNEL
    c = CHANNEL // 2
    ss = {"embedding": {
        "w": (jax.random.normal(keys[13], (kh * kw * c, HIDDEN)) * 0.02
              ).astype(dtype),
        "b": jnp.zeros((HIDDEN,), dtype)}}
    sc = {"embedding": {
        "w": (jax.random.normal(keys[14], (HIDDEN, kh * kw * c)) * 0.02
              ).astype(dtype),
        "b": jnp.zeros((kh * kw * c,), dtype)}}
    if variant == "base":
        sc["bias"] = jnp.zeros((60, 108, c), dtype)
    else:
        sc["bias_conv"] = _conv_init(keys[15], 3, 3, c, c, dtype=dtype)
    blocks = [tfocal.init_block_params(keys[16 + i], HIDDEN, WINDOW_SIZE,
                                       dtype=dtype)
              for i in range(DEPTHS)]
    key_fp, key_sp = jax.random.split(keys[-1])
    return {
        "encoder": enc,
        "decoder": dec,
        "feat_prop": feat_prop.init_params(key_fp, c, dtype=dtype),
        "ss": ss,
        "sc": sc,
        "transformer": blocks,
        "spynet": spynet.init_params(key_sp, dtype=dtype),
    }


def encode(enc_params, x):
    """x: (B*T, H, W, 3) -> (B*T, H/4, W/4, 128) with group-fusion concats."""
    out = x
    x0 = None
    for i, ((cin, cout, stride, groups), p) in enumerate(
            zip(_ENC_PLAN, enc_params)):
        if i == 4:
            x0 = out                      # 256-ch activation, 1/4 res
        if i in _ENC_FUSE_GROUPS:
            g = _ENC_FUSE_GROUPS[i]
            bt, h, w, _ = out.shape
            a = x0.reshape(bt, h, w, g, -1)
            o = out.reshape(bt, h, w, g, -1)
            out = jnp.concatenate([a, o], axis=-1).reshape(bt, h, w, -1)
        out = conv2d(out, p["w"], p["b"], stride=stride, padding=1,
                     groups=groups)
        out = leaky_relu(out, 0.2)
    return out


def decode(dec_params, x):
    """x: (B*T, H/4, W/4, 128) -> (B*T, H, W, 3) pre-tanh."""
    for i, ((kind, cin, cout), p) in enumerate(zip(_DEC_PLAN, dec_params)):
        if kind == "deconv":
            x = resize_scale2_aligned(x)
        x = conv2d(x, p["w"], p["b"], padding=1)
        if i < len(_DEC_PLAN) - 1:
            x = leaky_relu(x, 0.2)
    return x


def spynet_pairs(spynet_params, small_pairs_a, small_pairs_b):
    """Bidirectional SPyNet flows on explicit quarter-res frame pairs.

    small_pairs_a/b: (N, hs, ws, 3) in [0, 1]. Returns
    (flows_forward, flows_backward), each (N, hs, ws, 2):
    forward = flow(a -> b), backward = flow(b -> a) — matching the reference
    call SPyNet(lf[:-1], lf[1:]) / SPyNet(lf[1:], lf[:-1])
    (model/e2fgvi.py:221-228). Both directions run as ONE batched SPyNet
    call (batch entries are independent)."""
    n = small_pairs_a.shape[0]
    both = spynet.spynet_flow(
        spynet_params,
        jnp.concatenate([small_pairs_a, small_pairs_b], axis=0),
        jnp.concatenate([small_pairs_b, small_pairs_a], axis=0))
    return both[:n], both[n:]


def forward_bidirect_flow(spynet_params, masked_local_frames):
    """masked_local_frames: (B, L, H, W, 3) in [0, 1].

    Returns (flows_forward, flows_backward), each (B, L-1, H/4, W/4, 2)
    (reference model/e2fgvi.py:210-234)."""
    b, lt, h, w, _ = masked_local_frames.shape
    small = resize_scale_quarter(
        masked_local_frames.reshape(b * lt, h, w, 3))
    hs, ws = small.shape[1], small.shape[2]
    small = small.reshape(b, lt, hs, ws, 3)
    f1 = small[:, :-1].reshape(-1, hs, ws, 3)
    f2 = small[:, 1:].reshape(-1, hs, ws, 3)
    flows_forward, flows_backward = spynet_pairs(spynet_params, f1, f2)
    flows_forward = flows_forward.reshape(b, lt - 1, hs, ws, 2)
    flows_backward = flows_backward.reshape(b, lt - 1, hs, ws, 2)
    return flows_forward, flows_backward


def window_stage(params, feat, pred_flows, num_local_frames, num_out=None,
                 dcn_band=None, valid_local=None, frame_valid=None,
                 with_offset_bound=False, remat=False):
    """Per-window compute on precomputed encoder features.

    This is everything downstream of the (window-independent) encoder and
    SPyNet stages: deformable propagation on the local features, soft
    split, the transformer stack, soft composition, residual add, decode.

    Args:
      feat: (B, T, H/4, W/4, C) encoder features, locals first.
      pred_flows: (flows_forward, flows_backward), each
        (B, L-1, H/4, W/4, 2), as returned by forward_bidirect_flow /
        spynet_pairs on the local frames.
      num_local_frames: static int L.
      num_out: static int — decode only the first num_out frames (the
        sliding-window protocol consumes only the local frames; tokens of
        reference frames still feed every attention block, but fold +
        decode of their frames is skipped). None = all T frames.
      dcn_band: static int or None — band for the Pallas deformable-
        alignment sampler (see kernels/dcn_band.py); None = XLA gather.
      valid_local: optional (B,) int32 — real local-frame counts when
        windows are end-padded to a uniform geometry (see
        feat_prop.bidirectional_propagation).
      frame_valid: optional (B, T) bool — per-frame validity for the
        padded geometry (see tfocal.window_attention). Padded frames
        produce garbage outputs the caller discards.
    Returns:
      (B, num_out, H, W, 3) tanh output in [-1, 1].
    """
    lt = num_local_frames
    b, t, hq, wq, c = feat.shape
    n_out = t if num_out is None else num_out

    local_feat = feat_prop.bidirectional_propagation(
        params["feat_prop"], feat[:, :lt], pred_flows[0], pred_flows[1],
        dcn_band=dcn_band, valid_len=valid_local,
        with_offset_bound=with_offset_bound, remat=remat)
    off_bound = None
    if with_offset_bound:
        local_feat, off_bound = local_feat
    enc_feat = jnp.concatenate([local_feat, feat[:, lt:]], axis=1)

    output_size = (hq, wq)
    tokens = tfocal.soft_split(params["ss"],
                               enc_feat.reshape(b * t, hq, wq, c), b)
    tokens = tfocal.transformer_stack(params["transformer"], tokens,
                                      output_size, NUM_HEADS, WINDOW_SIZE,
                                      FOCAL_LEVEL, frame_valid=frame_valid,
                                      remat=remat)
    trans_feat = tfocal.soft_comp(params["sc"], tokens[:, :n_out], n_out,
                                  output_size)
    out_feat = enc_feat[:, :n_out] + trans_feat.reshape(b, n_out, hq, wq, c)

    out = decode(params["decoder"], out_feat.reshape(b * n_out, hq, wq, c))
    out = jnp.tanh(out).reshape(b, n_out, *out.shape[1:])
    if with_offset_bound:
        return out, off_bound
    return out


def generator_forward(params, masked_frames, num_local_frames,
                      remat=False):
    """Full generator forward.

    Args:
      params: pytree from init_params (or the checkpoint converter).
      masked_frames: (B, T, H, W, 3) in [-1, 1]; first `num_local_frames`
        are the local window, the rest are reference frames.
      num_local_frames: static int.
    Returns:
      output: (B*T, H, W, 3) in [-1, 1] (tanh),
      (flows_forward, flows_backward): the predicted local flows at 1/4 res.
    """
    lt = num_local_frames
    b, t, h, w, _ = masked_frames.shape

    local01 = (masked_frames[:, :lt] + 1.0) / 2.0
    pred_flows = forward_bidirect_flow(params["spynet"], local01)

    enc_feat = encode(params["encoder"],
                      masked_frames.reshape(b * t, h, w, 3))
    hq, wq = enc_feat.shape[1], enc_feat.shape[2]
    c = enc_feat.shape[-1]
    enc_feat = enc_feat.reshape(b, t, hq, wq, c)
    out = window_stage(params, enc_feat, pred_flows, lt, remat=remat)
    return out.reshape(b * t, h, w, 3), pred_flows
