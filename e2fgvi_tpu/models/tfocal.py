"""Temporal focal transformer stack (soft split / focal window attention /
soft composition / F3N feed-forward), JAX/NHWC.

Re-design of the reference tfocal_transformer[_hq].py for TPU:

- Soft split = patch extraction + ONE token-embedding GEMM (the reference's
  Unfold + Linear pair); soft composition = GEMM + overlap-add fold.
- Focal window attention is pure batched GEMMs over static windows:
  own-window keys, 4 diagonally rolled key sets (static valid-index gather),
  and one pooled coarse level (fc pooling + static unfold). All index maps
  and boundary masks are numpy constants baked at trace time.
- Hidden layout note: the F3N feed-forward interprets its 1960 hidden units
  as (kernel-position, channel) patches; we store them (k-major, c-minor) —
  the opposite of torch's (c-major) — so fold/unfold need no runtime
  permutes. The checkpoint converter permutes fc1/fc2 accordingly.

Static geometry: at the base config the token grid is 20x36, windows (5, 9),
expand (2, 4), one pooled focal level of 4x4 cells unfolded to 45 keys per
window (reference shapes tfocal_transformer.py:227-357). All of it
generalizes to any grid that tiles into (5, 9) windows (the HQ path pads
inputs so this always holds).
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from e2fgvi_tpu.ops.convs import layer_norm, linear, gelu
from e2fgvi_tpu.ops.patches import unfold, fold, fold_normalized, unfold_shape

T2T_KERNEL = (7, 7)
T2T_STRIDE = (3, 3)
T2T_PADDING = (3, 3)


# ---------------------------------------------------------------------------
# Soft split / soft composition
# ---------------------------------------------------------------------------

def token_grid(output_size):
    """Token-grid size for a feature map of `output_size` (torch Unfold
    arithmetic with the t2t kernel/stride/padding)."""
    return unfold_shape(output_size[0], output_size[1], T2T_KERNEL,
                        T2T_STRIDE, T2T_PADDING)


def soft_split(params, x, b):
    """x: (B*T, H, W, C) features -> (B, T, f_h, f_w, hidden) tokens.

    Unfold + token-embedding GEMM fused into ONE stride-3 convolution: the
    embedding weight (kh*kw*C, hidden), stored k-major, reshapes directly to
    an HWIO conv kernel (kh, kw, C, hidden). Replaces the reference's
    nn.Unfold + nn.Linear pair (tfocal_transformer.py:19-46) with a single
    MXU op."""
    from e2fgvi_tpu.ops.convs import conv2d
    bt, h, w, c = x.shape
    kh, kw = T2T_KERNEL
    wemb = params["embedding"]["w"]
    hidden = wemb.shape[-1]
    kconv = wemb.reshape(kh, kw, c, hidden)
    tok = conv2d(x, kconv, params["embedding"]["b"], stride=T2T_STRIDE,
                 padding=T2T_PADDING)
    lh, lw = tok.shape[1], tok.shape[2]
    return tok.reshape(b, bt // b, lh, lw, hidden)


def soft_comp(params, tokens, t, output_size):
    """tokens: (B, T, f_h, f_w, hidden) -> (B*T, H, W, C) features.

    One embedding GEMM (MXU) + overlap-add fold (the reference's Linear +
    nn.Fold pair, tfocal_transformer.py:49-72).

    Base model adds a learned bias map (params['bias'] of shape (H, W, C));
    the HQ model instead applies a 3x3 conv (params['bias_conv']).
    """
    from e2fgvi_tpu.ops.convs import conv2d
    b, tt, lh, lw, hidden = tokens.shape
    assert tt == t
    kh, kw = T2T_KERNEL
    feat = linear(tokens, params["embedding"]["w"], params["embedding"]["b"])
    c = feat.shape[-1] // (kh * kw)
    feat = feat.reshape(b * t, lh, lw, kh, kw, c)
    out = fold(feat, output_size, T2T_KERNEL, T2T_STRIDE, T2T_PADDING)
    if "bias" in params:
        out = out + params["bias"][None]
    else:
        out = conv2d(out, params["bias_conv"]["w"], params["bias_conv"]["b"],
                     padding=1)
    return out


# ---------------------------------------------------------------------------
# Window geometry helpers (all static numpy, cached per shape)
# ---------------------------------------------------------------------------

def _window_partition(x, wh, ww):
    """(B, T, H, W, C) -> (B*nWin, T, wh, ww, C), windows row-major."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)
    return x.reshape(b * (h // wh) * (w // ww), t, wh, ww, c)


def _window_reverse(wins, wh, ww, b, t, h, w):
    c = wins.shape[-1]
    x = wins.reshape(b, h // wh, w // ww, t, wh, ww, c)
    x = x.transpose(0, 3, 1, 4, 2, 5, 6)
    return x.reshape(b, t, h, w, c)


@lru_cache(maxsize=32)
def _rolled_valid_idx(wh, ww, eh, ew):
    """Indices of the out-of-own-window positions within the 4 rolled key
    sets (reference valid_ind_rolled buffer, tfocal_transformer.py:167-180).

    Returns int array indexing into a (4*wh*ww,) axis of stacked rolled
    windows ordered [tl, tr, bl, br]."""
    masks = []
    for sy, sx in ((1, 1), (1, 0), (0, 1), (0, 0)):  # tl, tr, bl, br
        m = np.ones((wh, ww), np.bool_)
        ys = slice(None, -eh) if sy else slice(eh, None)
        xs = slice(None, -ew) if sx else slice(ew, None)
        m[ys, xs] = False
        masks.append(m)
    flat = np.stack(masks, 0).reshape(-1)
    return np.nonzero(flat)[0].astype(np.int32)


@lru_cache(maxsize=32)
def _pooled_key_mask(nwh, nww, kh, kw, ph, pw):
    """Additive bias (-100 outside the pooled grid) for the unfolded pooled
    keys; (nWin, kh*kw) float32 (reference tfocal_transformer.py:300-316)."""
    iy = np.arange(nwh)[:, None, None, None]
    ix = np.arange(nww)[None, :, None, None]
    ay = np.arange(kh)[None, None, :, None]
    ax = np.arange(kw)[None, None, None, :]
    cy = iy + ay - ph
    cx = ix + ax - pw
    valid = (cy >= 0) & (cy < nwh) & (cx >= 0) & (cx < nww)
    valid = valid.reshape(nwh * nww, kh * kw)
    return np.where(valid, 0.0, -100.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Focal window attention
# ---------------------------------------------------------------------------

def window_attention(params, x, pooled, num_heads, window_size, expand_size,
                     frame_valid=None):
    """Focal attention over temporal windows.

    Args:
      x: (B, T, H, W, C) normalized tokens.
      pooled: (B, nWh, nWw, T, C) pooled coarse tokens (focal level 1),
        or None when focal_level <= 1.
      frame_valid: optional (B, T) bool — when windows of different
        temporal length are padded to a uniform T, keys (own, rolled and
        pooled) of padding frames are masked out so real queries attend
        exactly as in the unpadded forward. Attention is the only
        cross-frame op in the block, so this mask alone makes padding
        exact; padded frames' own outputs are garbage the caller discards.
    Returns:
      (B*nWin, T*wh*ww, C) attended tokens.
    """
    b, t, h, w, c = x.shape
    wh, ww = window_size
    eh, ew = expand_size
    hd = c // num_heads
    scale = hd ** -0.5
    nwin = (h // wh) * (w // ww)

    qkv = linear(x, params["qkv"]["w"], params["qkv"]["b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_of(wins):
        # (B*nWin, T, n, C) -> (B*nWin, heads, T*n, hd)
        bw, tt, nn, _ = wins.shape
        y = wins.reshape(bw, tt * nn, num_heads, hd)
        return y.transpose(0, 2, 1, 3)

    def part(z):
        return _window_partition(z, wh, ww).reshape(b * nwin, t, wh * ww, c)

    q_win = heads_of(part(q)) * scale
    k_win = heads_of(part(k))
    v_win = heads_of(part(v))

    # key-axis segments (own / rolled / pooled) are each t-major; the
    # frame-pad mask expands per segment by its keys-per-frame count
    seg_keys_per_frame = [wh * ww]

    # --- rolled (expanded) keys -------------------------------------------
    if eh > 0 or ew > 0:
        vidx = jnp.asarray(_rolled_valid_idx(wh, ww, eh, ew))

        def rolled(z):
            outs = []
            for sy, sx in ((-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)):
                zr = jnp.roll(z, shift=(sy, sx), axis=(2, 3))
                outs.append(part(zr))
            r = jnp.concatenate(outs, axis=2)        # (B*nWin, T, 4*wh*ww, C)
            r = jnp.take(r, vidx, axis=2)            # keep out-of-window only
            return heads_of(r)

        k_all = jnp.concatenate([k_win, rolled(k)], axis=2)
        v_all = jnp.concatenate([v_win, rolled(v)], axis=2)
        seg_keys_per_frame.append(int(vidx.shape[0]))
    else:
        k_all, v_all = k_win, v_win

    # --- pooled coarse keys (focal level 1) --------------------------------
    if pooled is not None:
        nwh, nww = pooled.shape[1], pooled.shape[2]
        pk = (2 * (wh // 2) + 1, 2 * (ww // 2) + 1)
        pp = (pk[0] // 2, pk[1] // 2)
        pq = linear(pooled, params["qkv"]["w"], params["qkv"]["b"])
        _, kp, vp = jnp.split(pq, 3, axis=-1)        # (B, nWh, nWw, T, C)

        def pooled_keys(z):
            z = z.transpose(0, 3, 1, 2, 4).reshape(b * t, nwh, nww, c)
            u = unfold(z, pk, 1, pp)                 # (B*T, nWh, nWw, kh,kw,C)
            u = u.reshape(b, t, nwh * nww, pk[0] * pk[1], c)
            u = u.transpose(0, 2, 1, 3, 4).reshape(b * nwh * nww, t,
                                                   pk[0] * pk[1], c)
            return heads_of(u)                       # (B*nWin, heads, T*kk, hd)

        k_all = jnp.concatenate([k_all, pooled_keys(kp)], axis=2)
        v_all = jnp.concatenate([v_all, pooled_keys(vp)], axis=2)
        pm = jnp.asarray(_pooled_key_mask(nwh, nww, pk[0], pk[1], *pp))
        # key ordering is (t, kk) t-major; bias is per (window, kk)
        pmt = jnp.tile(pm[:, None, :], (1, t, 1)).reshape(nwh * nww, -1)
        seg_keys_per_frame.append(pk[0] * pk[1])

    # assemble the additive bias over the full key axis, per (B*nWin, Nk):
    # the pooled-boundary -100 (reference tfocal_transformer.py:300-316)
    # plus a -1e9 on every key of a padding frame
    fine_len = sum(seg_keys_per_frame[:2 if (eh or ew) else 1]) * t
    nk = k_all.shape[2]
    bias_win = jnp.zeros((nwin, nk), jnp.float32)
    if pooled is not None:
        bias_win = bias_win.at[:, fine_len:].set(pmt)
    bias_full = jnp.tile(bias_win, (b, 1))
    if frame_valid is not None:
        segs = [jnp.repeat(~frame_valid, kpf, axis=1)
                for kpf in seg_keys_per_frame]
        key_pad = jnp.concatenate(segs, axis=1)          # (B, Nk)
        key_pad = jnp.repeat(key_pad, nwin, axis=0)      # (B*nWin, Nk)
        bias_full = jnp.where(key_pad, -1e9, bias_full)

    out = _attention_core(q_win, k_all, v_all, bias_full, b)
    out = out.transpose(0, 2, 1, 3).reshape(b * nwin, t * wh * ww, c)
    return linear(out, params["proj"]["w"], params["proj"]["b"])


def _attention_core(q_win, k_all, v_all, bias_full, b):
    """softmax(q k^T + bias) v.

    Two interchangeable backends (validated equal to ~5e-4 in bf16):

    - 'flash': the Pallas flash-attention kernel (TPU default; never
      materializes the (Bw, heads, Nq, Nk) logits — the logits tensor is
      the dominant HBM traffic of the whole transformer at the base
      geometry). The 0/-100 pooled-boundary bias is binary, so it maps
      exactly onto flash attention's segment masking. With block sizes
      covering the full key axis per q block this measures 39.8 ms vs the
      XLA path's 74.7 ms at the bench geometry (B=8, T=17).
    - 'xla': batched einsums + softmax — the CPU/interpret path, and the
      fallback for geometries the kernel can't tile. Select with
      E2FGVI_ATTENTION=xla.
    """
    import os
    if (os.environ.get("E2FGVI_ATTENTION", "flash") == "flash"
            and jax.default_backend() != "cpu"
            and q_win.dtype in (jnp.bfloat16, jnp.float16)):
        # 16-bit speed path only: the whole-key-axis blocks exceed the
        # scoped-VMEM budget at f32, and the f32 path is the parity path
        # where the fused kernel buys little
        return _attention_flash(q_win, k_all, v_all, bias_full, b)
    return _attention_xla(q_win, k_all, v_all, bias_full, b)


def _attention_xla(q_win, k_all, v_all, bias_full, b):
    dtype = q_win.dtype
    attn = jnp.einsum("bhqd,bhkd->bhqk", q_win, k_all,
                      preferred_element_type=jnp.float32)
    attn = attn + bias_full[:, None, None, :]
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v_all,
                      preferred_element_type=jnp.float32).astype(dtype)


def _attention_flash(q_win, k_all, v_all, bias_full, b):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    bw, heads, nq, hd = q_win.shape
    nk = k_all.shape[2]
    # block tuning (measured at the bench geometry): one q block spanning
    # the whole (padded) query axis and 512-wide k blocks under a
    # whole-axis k-major block halves the default kernel's runtime. k is
    # padded to a multiple of 512 so block_k always divides block_k_major.
    pad_q = (-nq) % 128
    pad_k = (-nk) % 512 if nk > 512 else (-nk) % 128
    q = jnp.pad(q_win, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    k = jnp.pad(k_all, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    v = jnp.pad(v_all, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    # segments: 0 = real tokens; 1 = q padding; 2 = masked/padded keys.
    # q==kv segment required to attend, so real queries see only real,
    # unmasked keys. q-padding rows attend to nothing -> the kernel's
    # masked-row softmax yields zeros (sliced away below).
    q_seg = jnp.concatenate(
        [jnp.zeros((bw, nq), jnp.int32),
         jnp.full((bw, pad_q), 1, jnp.int32)], axis=1)
    kv_mask = (bias_full < -50.0)
    kv_seg = jnp.concatenate(
        [jnp.where(kv_mask, 2, 0).astype(jnp.int32),
         jnp.full((bw, pad_k), 2, jnp.int32)], axis=1)
    nqp, nkp = nq + pad_q, nk + pad_k
    bq = nqp
    if bq > 1024:                       # block_q must divide padded nq
        bq = max(d for d in (512, 256, 128) if nqp % d == 0)
    bs = fa.BlockSizes(block_q=bq,
                       block_k_major=nkp, block_k=min(512, nkp),
                       block_b=1)
    out = fa.flash_attention(
        q, k, v, segment_ids=fa.SegmentIds(q=q_seg, kv=kv_seg),
        sm_scale=1.0, block_sizes=bs)
    return out[:, :, :nq, :].astype(q_win.dtype)


# ---------------------------------------------------------------------------
# F3N fusion feed-forward
# ---------------------------------------------------------------------------

def fusion_feed_forward(params, x, t, output_size):
    """x: (B, N, C) tokens; overlap-renormalized token mixing (F3N).

    Two exact formulations (validated equal to ~6e-7 rel in f32):

    - 'conv': fc1+fold collapse into ONE lhs-dilated convolution
      (tokens -> pixels) and unfold+fc2 into ONE strided convolution
      (pixels -> tokens), with gelu moved to pixel space (elementwise ops
      commute with the pure-gather unfold). The (B, N, 1960) hidden patch
      tensor — 5x the pixel tensor — is never materialized.
    - 'gemm': the literal chain (fc1 GEMM -> fold -> unfold -> gelu ->
      fc2 GEMM); hidden units are laid out (kernel-position, channel) so
      fold/unfold need no runtime permutes (see module docstring).
      Select with E2FGVI_F3N=gemm.
    """
    import os
    if os.environ.get("E2FGVI_F3N", "conv") == "conv":
        return _fusion_feed_forward_conv(params, x, t, output_size)
    b, n, c = x.shape
    hid = linear(x, params["fc1"]["w"], params["fc1"]["b"])  # (B, N, 1960)
    hd = hid.shape[-1]
    kh, kw = T2T_KERNEL
    cc = hd // (kh * kw)                                      # 40
    lh, lw = token_grid(output_size)
    n_vecs = lh * lw
    p = hid.reshape(b * (n // n_vecs), lh, lw, kh, kw, cc)
    y = fold_normalized(p, output_size, T2T_KERNEL, T2T_STRIDE, T2T_PADDING)
    y = unfold(y, T2T_KERNEL, T2T_STRIDE, T2T_PADDING)
    y = y.reshape(b, n, hd)
    y = gelu(y)
    return linear(y, params["fc2"]["w"], params["fc2"]["b"])


def _fusion_feed_forward_conv(params, x, t, output_size):
    """Conv-form F3N (see fusion_feed_forward).

    Derivation: hidden patches are k-major, so fold(fc1(x)) ==
    conv(x_tokens, flip(W1), lhs_dilation=stride) — a transposed conv from
    the token grid to pixel space — plus the fold of the broadcast fc1
    bias (a static map). unfold is a pure gather, so gelu commutes with
    it, and fc2(unfold(z)) == conv(z, W2, stride) back to the token grid.
    """
    from e2fgvi_tpu.ops.patches import fold, fold_counts
    hh, ww = output_size
    kh, kw = T2T_KERNEL
    sh, sw = T2T_STRIDE
    ph, pw = T2T_PADDING
    lh, lw = token_grid(output_size)
    b, n, c = x.shape
    bt = b * (n // (lh * lw))
    cc = params["fc1"]["w"].shape[-1] // (kh * kw)
    # output cropping can't express pad_hi < 0 (never hits for the t2t
    # arithmetic at tile-able sizes)
    pad_hi_h = hh - sh * (lh - 1) - 1 - ph + kh - 1
    pad_hi_w = ww - sw * (lw - 1) - 1 - pw + kw - 1
    assert pad_hi_h >= 0 and pad_hi_w >= 0, (hh, ww, lh, lw)

    xt = x.reshape(bt, lh, lw, c)
    w1 = params["fc1"]["w"].reshape(c, kh, kw, cc)
    # conv requires matching dtypes; mixed setups (bf16 params, f32
    # activations and vice versa) follow the activation dtype like linear()
    k1 = jnp.flip(w1, axis=(1, 2)).transpose(1, 2, 0, 3).astype(xt.dtype)
    z = jax.lax.conv_general_dilated(
        xt, k1, window_strides=(1, 1),
        padding=((ph, pad_hi_h), (pw, pad_hi_w)), lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bpatch = jnp.broadcast_to(
        params["fc1"]["b"].reshape(1, 1, 1, kh, kw, cc),
        (1, lh, lw, kh, kw, cc)).astype(z.dtype)
    foldb = fold(bpatch, output_size, T2T_KERNEL, T2T_STRIDE, T2T_PADDING)
    cnt = fold_counts(output_size, T2T_KERNEL, T2T_STRIDE, T2T_PADDING,
                      dtype=jnp.float32)
    z = ((z + foldb).astype(jnp.float32) / cnt[None]).astype(z.dtype)
    zg = gelu(z)
    w2 = params["fc2"]["w"].reshape(kh, kw, cc, c).astype(zg.dtype)
    y = jax.lax.conv_general_dilated(
        zg, w2, window_strides=(sh, sw), padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y + params["fc2"]["b"].astype(y.dtype)).reshape(b, n, c)


# ---------------------------------------------------------------------------
# Transformer block + stack
# ---------------------------------------------------------------------------

def _pool_level(params, x, window_size):
    """fc-pool each (wh, ww) window to one token (focal level 1).

    x: (B, T, H, W, C) -> (B, nWh, nWw, T, C). Pads/trims H, W to tile
    exactly (reference tfocal_transformer.py:478-519)."""
    b, t, h, w, c = x.shape
    wh, ww = window_size
    hp = math.ceil(h / wh) * wh
    wp = math.ceil(w / ww) * ww
    if h != hp:
        if h > hp:
            tr = (h - hp) // 2
            x = x[:, :, tr: tr + hp]
        else:
            pt = (hp - h) // 2
            x = jnp.pad(x, ((0, 0), (0, 0), (pt, hp - h - pt), (0, 0),
                            (0, 0)))
    if w != wp:
        if w > wp:
            tr = (w - wp) // 2
            x = x[:, :, :, tr: tr + wp]
        else:
            pl = (wp - w) // 2
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pl, wp - w - pl),
                            (0, 0)))
    nwh, nww = hp // wh, wp // ww
    xw = x.reshape(b, t, nwh, wh, nww, ww, c)
    xw = xw.transpose(0, 2, 4, 1, 6, 3, 5).reshape(b, nwh, nww, t, c,
                                                   wh * ww)
    pooled = linear(xw, params["pool"]["w"], params["pool"]["b"])
    return pooled[..., 0]                              # (B, nWh, nWw, T, C)


def transformer_block(params, x, output_size, num_heads=4,
                      window_size=(5, 9), focal_level=2, frame_valid=None):
    """One temporal focal transformer block. x: (B, T, fh, fw, C)."""
    b, t, h, w, c = x.shape
    wh, ww = window_size
    expand = (wh // 2, ww // 2)

    shortcut = x
    xn = layer_norm(x, params["norm1"]["g"], params["norm1"]["b"])
    pooled = _pool_level(params, xn, window_size) if focal_level > 1 else None
    attn = window_attention(params["attn"], xn, pooled, num_heads,
                            window_size, expand, frame_valid=frame_valid)
    attn = attn.reshape(b * (h // wh) * (w // ww), t, wh, ww, c)
    x = shortcut + _window_reverse(attn, wh, ww, b, t, h, w)

    y = layer_norm(x, params["norm2"]["g"], params["norm2"]["b"])
    y = fusion_feed_forward(params["mlp"], y.reshape(b, t * h * w, c), t,
                            output_size)
    return x + y.reshape(b, t, h, w, c)


def transformer_stack(params_list, x, output_size, num_heads=4,
                      window_size=(5, 9), focal_level=2, frame_valid=None,
                      remat=False):
    blk = transformer_block
    if remat:
        # training: recompute each block's internals in the backward pass
        # instead of saving per-block attention/F3N residuals
        blk = jax.checkpoint(
            lambda p, z: transformer_block(p, z, output_size, num_heads,
                                           window_size, focal_level,
                                           frame_valid=frame_valid))
        for p in params_list:
            x = blk(p, x)
        return x
    for p in params_list:
        x = transformer_block(p, x, output_size, num_heads, window_size,
                              focal_level, frame_valid=frame_valid)
    return x


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _linear_init(key, cin, cout, gain=0.02, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    return {"w": (jax.random.normal(k1, (cin, cout)) * gain).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def init_block_params(key, dim=512, window_size=(5, 9), d_ff=1960,
                      dtype=jnp.float32):
    keys = jax.random.split(key, 6)
    wa = window_size[0] * window_size[1]
    return {
        "norm1": {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "norm2": {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "attn": {
            "qkv": _linear_init(keys[0], dim, 3 * dim, dtype=dtype),
            "proj": _linear_init(keys[1], dim, dim, dtype=dtype),
        },
        "mlp": {
            "fc1": _linear_init(keys[2], dim, d_ff, dtype=dtype),
            "fc2": _linear_init(keys[3], d_ff, dim, dtype=dtype),
        },
        # fc pooling init: mean pooling (reference tf.py:448-450)
        "pool": {"w": jnp.full((wa, 1), 1.0 / wa, dtype),
                 "b": jnp.zeros((1,), dtype)},
    }
