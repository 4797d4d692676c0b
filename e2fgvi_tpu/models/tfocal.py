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
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from e2fgvi_tpu.ops.convs import layer_norm, linear, gelu
from e2fgvi_tpu.ops.patches import unfold, fold, fold_normalized, unfold_shape

T2T_KERNEL = (7, 7)
T2T_STRIDE = (3, 3)
T2T_PADDING = (3, 3)


def _env_choice(name, default, valid):
    """Read a backend-selection env var, failing loudly on unknown values
    (a typo or a removed backend name must not silently fall through to a
    different implementation)."""
    val = os.environ.get(name, default)
    if val not in valid:
        raise ValueError(
            f"{name}={val!r} is not a known backend (choose from {valid})")
    return val


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


def _tokens_to_pixels_conv(xt, w, bias, output_size):
    """fold(linear(tokens)) as ONE dense subpixel convolution.

    xt: (BT, f_h, f_w, C) tokens; w: (C, kh*kw*cc) k-major patch weight;
    bias: (kh*kw*cc,) or None. Returns (BT, H, W, cc) — exactly
    fold(linear(xt, w, bias), output_size) (plain overlap-add).

    Derivation: hidden patches are k-major, so fold(w @ tok) ==
    conv(tokens, flip(w), lhs_dilation=stride) — a transposed conv from
    the token grid to pixel space — plus the fold of the broadcast bias
    (a static map). The lhs-dilated form makes XLA correlate the full
    kh*kw kernel against a mostly-zero dilated grid (~(sh*sw)x wasted MXU
    work), so the sh*sw output phases are computed as channels of ONE
    dense token-grid conv and depth-to-space'd. The literal GEMM+fold
    chain costs ~35 ms at the bench geometry (exp_decparts2_r04: the
    (BT, f_h, f_w, kh, kw, cc) patch tensor's (7, 128)-minor relayout +
    the overlap-add), the subpixel conv ~an eighth of that.
    """
    bt, lh, lw, c = xt.shape
    hh, ww = output_size
    kh, kw = T2T_KERNEL
    sh, sw = T2T_STRIDE
    ph, pw = T2T_PADDING
    cc = w.shape[-1] // (kh * kw)
    w1 = w.reshape(c, kh, kw, cc)
    k1 = jnp.flip(w1, axis=(1, 2)).transpose(1, 2, 0, 3).astype(xt.dtype)
    dlo = -(-ph // sh)
    dhi = (sh - 1 - ph + kh - 1) // sh
    dxlo = -(-pw // sw)
    dxhi = (sw - 1 - pw + kw - 1) // sw
    ksub = jnp.zeros((dlo + dhi + 1, dxlo + dxhi + 1, c, sh, sw, cc),
                     k1.dtype)
    for p in range(sh):
        for q in range(sw):
            for dy in range(-dlo, dhi + 1):
                ky = sh * dy - p + ph
                if not 0 <= ky < kh:
                    continue
                for dx in range(-dxlo, dxhi + 1):
                    kx = sw * dx - q + pw
                    if not 0 <= kx < kw:
                        continue
                    ksub = ksub.at[dy + dlo, dx + dxlo, :, p, q, :].set(
                        k1[ky, kx])
    ksub = ksub.reshape(dlo + dhi + 1, dxlo + dxhi + 1, c, sh * sw * cc)
    zs = jax.lax.conv_general_dilated(
        xt, ksub, window_strides=(1, 1), padding=((dlo, dhi), (dxlo, dxhi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    zs = zs.reshape(bt, lh, lw, sh, sw, cc).transpose(0, 1, 3, 2, 4, 5)
    z = zs.reshape(bt, lh * sh, lw * sw, cc)[:, :hh, :ww]
    if bias is not None:
        bpatch = jnp.broadcast_to(
            bias.reshape(1, 1, 1, kh, kw, cc),
            (1, lh, lw, kh, kw, cc)).astype(z.dtype)
        z = z + fold(bpatch, output_size, T2T_KERNEL, T2T_STRIDE,
                     T2T_PADDING)
    return z


def soft_comp(params, tokens, t, output_size):
    """tokens: (B, T, f_h, f_w, hidden) -> (B*T, H, W, C) features.

    The reference's Linear + nn.Fold pair (tfocal_transformer.py:49-72) as
    one subpixel convolution (see _tokens_to_pixels_conv) on TPU; CPU
    backends take the literal GEMM + overlap-add fold — the subpixel
    conv's vjp (a transposed conv of a depth-to-space graph inside the
    remat'd train step) costs minutes of XLA:CPU compile time, which
    regressed the driver's virtual-mesh dryrun in r04 (VERDICT r04 #1).
    Both forms are validated equal (tests/test_tfocal.py).

    Base model adds a learned bias map (params['bias'] of shape (H, W, C));
    the HQ model instead applies a 3x3 conv (params['bias_conv']).
    """
    from e2fgvi_tpu.ops.convs import conv2d
    b, tt, lh, lw, hidden = tokens.shape
    assert tt == t
    if jax.default_backend() == "cpu":
        kh, kw = T2T_KERNEL
        w = params["embedding"]["w"]
        cc = w.shape[-1] // (kh * kw)
        patches = linear(tokens.reshape(b * t, lh * lw, hidden), w,
                         params["embedding"]["b"])
        out = fold(patches.reshape(b * t, lh, lw, kh, kw, cc),
                   output_size, T2T_KERNEL, T2T_STRIDE, T2T_PADDING)
    else:
        out = _tokens_to_pixels_conv(
            tokens.reshape(b * t, lh, lw, hidden), params["embedding"]["w"],
            params["embedding"]["b"], output_size)
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


@lru_cache(maxsize=32)
def _rolled_rects(wh, ww, eh, ew):
    """The 4-rolled out-of-own-window key multiset (reference
    valid_ind_rolled, tfocal_transformer.py:167-180) as per-roll
    RECTANGLES in window coordinates: each roll's valid positions form an
    L = one full-width row band + one partial column band. Returns
    ((sy, sx, y0, y1, x0, x1), ...) — the same key multiset as
    _rolled_valid_idx up to order (softmax is permutation-invariant).
    Rectangles turn key assembly into static slices of the wrap-padded
    feature map — no gather, no roll."""
    rects = []
    for (sy, sx), (fy, fx) in zip(
            ((-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)),
            ((1, 1), (1, 0), (0, 1), (0, 0))):
        if fy:      # masked-out block occupies rows [0, wh-eh)
            rows_full, rows_part = (wh - eh, wh), (0, wh - eh)
        else:       # masked-out block occupies rows [eh, wh)
            rows_full, rows_part = (0, eh), (eh, wh)
        cols_part = (ww - ew, ww) if fx else (0, ew)
        rects.append((sy, sx, rows_full[0], rows_full[1], 0, ww))
        rects.append((sy, sx, rows_part[0], rows_part[1],
                      cols_part[0], cols_part[1]))
    return tuple(r for r in rects if r[3] > r[2] and r[5] > r[4])


@lru_cache(maxsize=32)
def _key_gather_idx(h, w, wh, ww, eh, ew, pooled_geom):
    """Static per-window key source indices into the flattened combined
    source axis [fine tokens (h*w) | pooled tokens (nwh*nww) | one zero
    slot].

    Replaces the reference's roll/partition/concat key assembly
    (tfocal_transformer.py:234-316) with ONE gather: per window the slots
    are [own (wh*ww) | 4-rolled out-of-window (from _rolled_valid_idx) |
    unfolded pooled (pkh*pkw, out-of-grid -> the zero slot)]. torch.roll's
    wrap-around at image borders is reproduced by the mod indexing.

    Returns (idx, n_fine): idx int32 (nwin, S); the first n_fine slots of
    S index fine tokens, the rest pooled.
    """
    nwy, nwx = h // wh, w // ww
    vidx = _rolled_valid_idx(wh, ww, eh, ew) if (eh or ew) else None
    shifts = ((-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew))
    rows = []
    for wy in range(nwy):
        for wx in range(nwx):
            slots = [(wy * wh + ry) * w + (wx * ww + rx)
                     for ry in range(wh) for rx in range(ww)]
            if vidx is not None:
                for v in vidx:
                    r, rem = divmod(int(v), wh * ww)
                    ry, rx = divmod(rem, ww)
                    sy, sx = shifts[r]
                    slots.append(((wy * wh + ry - sy) % h) * w
                                 + (wx * ww + rx - sx) % w)
            rows.append(slots)
    n_fine = len(rows[0])
    if pooled_geom is not None:
        nwh, nww, pkh, pkw, ph, pw = pooled_geom
        assert (nwy, nwx) == (nwh, nww), (nwy, nwx, nwh, nww)
        base = h * w
        zero_slot = base + nwh * nww
        for wy in range(nwy):
            for wx in range(nwx):
                slots = rows[wy * nwx + wx]
                for ay in range(pkh):
                    for ax in range(pkw):
                        py, px = wy + ay - ph, wx + ax - pw
                        ok = 0 <= py < nwh and 0 <= px < nww
                        slots.append(base + py * nww + px if ok
                                     else zero_slot)
    return np.asarray(rows, np.int32), n_fine


@lru_cache(maxsize=32)
def _key_gather_dedup(h, w, wh, ww, eh, ew, pooled_geom):
    """Deduplicated per-window key table for the fused gather path
    (own-window slots already removed, as in _window_attention_fused).

    The rolled multiset repeats 12 of its 120 slots at the serving
    geometry (the four roll L-shapes overlap pairwise), and the pooled
    5x9 unfold window mostly falls OUTSIDE the tiny pooled grid — all
    out-of-grid slots read the same zero row with the same -100 boundary
    bias (reference tfocal_transformer.py:300-316). Softmax treats n
    identical (key, bias) slots exactly like ONE slot with bias + ln(n):
    exp(l + ln n) = n exp(l) in both the normalizer and the value
    average. Collapsing duplicates cuts S_pad 176 -> 128 at the serving
    geometry — 27% fewer rows in the k/v take AND 27% fewer key columns
    in the dominant logit panel.

    Returns (idx (nwin, S) int32, bias (nwin, S) f32): first-occurrence
    order; padding slots (windows have 121-125 unique keys) index the
    zero row with bias -1e9.
    """
    idx, n_fine = _key_gather_idx(h, w, wh, ww, eh, ew, pooled_geom)
    wa = wh * ww
    idx = idx[:, wa:]
    n_fine -= wa
    nwh, nww, pkh, pkw, ph, pw = pooled_geom
    pm = _pooled_key_mask(nwh, nww, pkh, pkw, ph, pw)
    zero_slot = h * w + nwh * nww
    rows = []
    for wi in range(idx.shape[0]):
        slots = [(int(s), 0.0) for s in idx[wi, :n_fine]]
        slots += [(int(s), float(bb))
                  for s, bb in zip(idx[wi, n_fine:], pm[wi])]
        counts, order = {}, []
        for key in slots:
            if key not in counts:
                order.append(key)
            counts[key] = counts.get(key, 0) + 1
        rows.append([(s, b + math.log(counts[(s, b)]))
                     for (s, b) in order])
    smax = max(len(r) for r in rows)
    out_idx = np.full((len(rows), smax), zero_slot, np.int32)
    out_bias = np.full((len(rows), smax), -1e9, np.float32)
    for i, r in enumerate(rows):
        out_idx[i, :len(r)] = [s for s, _ in r]
        out_bias[i, :len(r)] = [b for _, b in r]
    return out_idx, out_bias


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

    nwy, nwx = h // wh, w // ww

    # qkv in per-head layout directly — the head split rides the GEMM
    # epilogue instead of a separate relayout of the big tensor
    wq = params["qkv"]["w"].reshape(c, 3, num_heads, hd)
    bq = params["qkv"]["b"].reshape(3, num_heads, hd)
    qkv = jnp.einsum("btyxc,cghd->gbhtyxd", x, wq.astype(x.dtype))
    qkv = qkv + bq[:, None, :, None, None, None, :].astype(qkv.dtype)
    q, k, v = qkv[0], qkv[1], qkv[2]       # (B, heads, T, H, W, hd)

    # pooled coarse tokens (focal level 1): tiny qkv
    kp = vp = pq = None
    if pooled is not None:
        nwh, nww = pooled.shape[1], pooled.shape[2]
        pk = (2 * (wh // 2) + 1, 2 * (ww // 2) + 1)
        pp = (pk[0] // 2, pk[1] // 2)
        pq = jnp.einsum("byxtc,cghd->gbhtyxd", pooled, wq.astype(x.dtype))
        pq = pq + bq[:, None, :, None, None, None, :].astype(pq.dtype)

    # fused backend (TPU serving default): ONE static gather into a
    # (B*heads, T, nWin, S_pad, hd) layout + a Pallas kernel whose block
    # index maps select each window's keys directly — the replicated
    # (B*nWin, heads, Nk, hd) k/v tensors never exist in HBM
    # (kernels/fused_attention.py; r03 profile: their assembly alone cost
    # 35.6 ms/block, more than the attention core)
    backend = _env_choice("E2FGVI_ATTENTION", "fused",
                          ("fused", "flash", "xla"))
    if (backend == "fused" and pooled is not None and (eh or ew)
            and q.dtype in (jnp.bfloat16, jnp.float16)
            and jax.default_backend() != "cpu"):
        # training runs f32 and never reaches this branch — load-bearing:
        # the fused kernel's custom_vjp backward re-materializes the
        # replicated logits through the XLA reference formulation
        # (kernels/fused_attention.py:_bwd), an HBM trap at scale
        return _window_attention_fused(
            params, q, k, v, pq, scale, window_size, expand_size,
            frame_valid)

    if pooled is not None:
        # pad to the unfold footprint so per-window pooled keys are static
        # slices (slice-assembly path only; the fused path gathers from
        # the unpadded pq directly)
        pad_p = ((0, 0), (0, 0), (0, 0), (pp[0], pp[0]), (pp[1], pp[1]),
                 (0, 0))
        kp = jnp.pad(pq[1], pad_p)         # (B, heads, T, nWh+2p, nWw+2p, d)
        vp = jnp.pad(pq[2], pad_p)

    # key assembly = static slice-concat of the wrap-padded per-head maps:
    # own window + the rolled key multiset as rectangles (_rolled_rects;
    # torch.roll wrap-around = the "wrap" padding) + the pooled unfold
    # window (zero padding, masked by the -100 bias below). The stack
    # lands directly in the attention layout — no gather, no big
    # relayout. Key order per frame: [own | rolled rects | pooled].
    rects = _rolled_rects(wh, ww, eh, ew) if (eh or ew) else ()
    if rects:
        pad_f = ((0, 0), (0, 0), (0, 0), (eh, eh), (ew, ew), (0, 0))
        kf = jnp.pad(k, pad_f, mode="wrap")
        vf = jnp.pad(v, pad_f, mode="wrap")
    else:
        kf, vf = k, v

    def win_keys(z, zp, wy, wx):
        parts = []
        oy = wy * wh + (eh if rects else 0)
        ox = wx * ww + (ew if rects else 0)
        parts.append(z[:, :, :, oy: oy + wh, ox: ox + ww, :])
        for (sy, sx, y0, y1, x0, x1) in rects:
            ry = wy * wh + y0 - sy + eh
            rx = wx * ww + x0 - sx + ew
            parts.append(z[:, :, :, ry: ry + (y1 - y0),
                           rx: rx + (x1 - x0), :])
        if zp is not None:
            parts.append(zp[:, :, :, wy: wy + pk[0], wx: wx + pk[1], :])
        flat = [p.reshape(b, num_heads, t, -1, hd) for p in parts]
        return jnp.concatenate(flat, axis=3)   # (B, heads, T, S, hd)

    def assemble(z, zp):
        wins = [win_keys(z, zp, wy, wx)
                for wy in range(nwy) for wx in range(nwx)]
        g = jnp.stack(wins, axis=1)            # (B, nWin, heads, T, S, hd)
        return g.reshape(b * nwin, num_heads, -1, hd)

    k_all = assemble(kf, kp)
    v_all = assemble(vf, vp)
    s_keys = k_all.shape[2] // t
    n_fine = s_keys - (pk[0] * pk[1] if pooled is not None else 0)

    q_wins = [q[:, :, :, wy * wh: (wy + 1) * wh,
                wx * ww: (wx + 1) * ww, :].reshape(b, num_heads, t,
                                                  wh * ww, hd)
              for wy in range(nwy) for wx in range(nwx)]
    q_win = jnp.stack(q_wins, axis=1).reshape(b * nwin, num_heads,
                                              t * wh * ww, hd) * scale

    # additive bias over the key axis, per (B*nWin, Nk): the pooled
    # -boundary -100 (reference tfocal_transformer.py:300-316) plus a -1e9
    # on every key of a padding frame. Key order: t-major frames, within a
    # frame [fine (n_fine) | pooled (S - n_fine)].
    nk = t * s_keys
    bias_win = jnp.zeros((nwin, s_keys), jnp.float32)
    if pooled is not None:
        pm = jnp.asarray(_pooled_key_mask(nwh, nww, pk[0], pk[1], *pp))
        bias_win = bias_win.at[:, n_fine:].set(pm)
    bias_win = jnp.tile(bias_win[:, None, :], (1, t, 1)).reshape(nwin, nk)
    bias_full = jnp.tile(bias_win, (b, 1))
    if frame_valid is not None:
        key_pad = jnp.repeat(~frame_valid, s_keys, axis=1)   # (B, Nk)
        key_pad = jnp.repeat(key_pad, nwin, axis=0)          # (B*nWin, Nk)
        bias_full = jnp.where(key_pad, -1e9, bias_full)

    out = _attention_core(q_win, k_all, v_all, bias_full, b)
    out = out.transpose(0, 2, 1, 3).reshape(b * nwin, t * wh * ww, c)
    return linear(out, params["proj"]["w"], params["proj"]["b"])


def _window_attention_fused(params, q, k, v, pq, scale, window_size,
                            expand_size, frame_valid, interpret=False):
    """Gather-layout focal attention (kernels/fused_attention.py).

    q/k/v: (B, heads, T, H, W, hd) per-head maps; pq: (3, B, heads, T,
    nWh, nWw, hd) pooled qkv (index 0 unused). Produces the same result
    as the slice-assembly + flash path — identical key multiset (the
    static `_key_gather_idx` table enumerates own/rolled/pooled sources
    with torch.roll wrap semantics), permutation-invariant softmax, and
    the reference's additive -100 pooled-boundary mask — with ~3x less
    HBM traffic (compact maps instead of replicated windows)."""
    b, heads, t, h, w, hd = q.shape
    wh, ww = window_size
    eh, ew = expand_size
    nwy, nwx = h // wh, w // ww
    nwin = nwy * nwx
    nwh, nww = pq.shape[4], pq.shape[5]
    pk = (2 * (wh // 2) + 1, 2 * (ww // 2) + 1)
    pp = (pk[0] // 2, pk[1] // 2)

    geom = (nwh, nww, pk[0], pk[1], pp[0], pp[1])
    # the first wh*ww slots per window are the window's OWN tokens (see
    # _key_gather_idx) — those never ride the gather: they are the same
    # window partition as the queries, one cheap transpose of the compact
    # maps (the take is the dominant attention cost, and own keys are 21%
    # of its rows). The gather carries only rolled + pooled slots, and by
    # default the DEDUPED table (identical (key, bias) slots collapsed
    # with a log-multiplicity bias — exact, see _key_gather_dedup).
    wa = wh * ww
    if _env_choice("E2FGVI_ATTN_DEDUPE", "on", ("on", "off")) == "on":
        idx, bias_rows = _key_gather_dedup(h, w, wh, ww, eh, ew, geom)
    else:
        idx, n_fine = _key_gather_idx(h, w, wh, ww, eh, ew, geom)
        idx = idx[:, wa:]
        n_fine -= wa
        bias_rows = np.zeros(idx.shape, np.float32)
        bias_rows[:, n_fine:] = _pooled_key_mask(nwh, nww, pk[0], pk[1],
                                                 *pp)
    s_keys = idx.shape[1]
    # pad the per-frame key count to the bf16 sublane tile (16) so the
    # kernel's (T, S_pad, hd) -> (T*S_pad, hd) view is layout-free; pad
    # slots read the zero row and carry a -1e9 bias
    s_pad = -(-s_keys // 16) * 16
    zero_slot = h * w + nwh * nww
    idx_pad = np.full((nwin, s_pad), zero_slot, np.int32)
    idx_pad[:, :s_keys] = idx

    def gather(z, zp):
        src = jnp.concatenate([
            z.reshape(b * heads, t, h * w, hd),
            zp.reshape(b * heads, t, nwh * nww, hd),
            jnp.zeros((b * heads, t, 1, hd), z.dtype)], axis=2)
        g = jnp.take(src, jnp.asarray(idx_pad.reshape(-1)), axis=2)
        return g.reshape(b * heads, t, nwin, s_pad, hd)

    # Two separate bf16 takes. A packed int32 single-take (k in the high
    # 16 bits, v in the low — halves the row count at double row width)
    # was A/B'd on-chip and LOST: takes 8.77 -> 11.65 ms, whole attention
    # 25.97 -> 30.10 ms at the dedup table (exp_attn_r05; same direction
    # at the full table). XLA's gather prefers the narrower 256 B rows —
    # the opposite trade from the DCN sampler's lane-packed gather, whose
    # rows are single vregs either way. Removed per the repo's
    # measured-loser precedent (see also the r04 backend removals); a
    # deployment still pinning the removed value fails loudly here.
    _env_choice("E2FGVI_ATTN_GATHER", "two", ("two",))
    k_gath = gather(k, pq[1])
    v_gath = gather(v, pq[2])

    nq = t * wh * ww
    nq_pad = -(-nq // 16) * 16

    def partition(z, scl=None):
        zw = z if scl is None else z * scl
        zw = zw.reshape(b, heads, t, nwy, wh, nwx, ww, hd)
        return zw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b * heads * nwin, nq, hd)

    qw = jnp.pad(partition(q, scale), ((0, 0), (0, nq_pad - nq), (0, 0)))
    ko = partition(k)
    vo = partition(v)

    # per-key bias: 0 on fine keys, the reference's -100 outside the
    # pooled grid (tfocal_transformer.py:300-316), + ln(multiplicity) on
    # deduped slots, -1e9 on padding slots and padding frames (exp
    # underflows to exactly 0 in f32). Own keys carry only the frame
    # -validity term.
    bias_win = np.full((nwin, s_pad), -1e9, np.float32)
    bias_win[:, :s_keys] = bias_rows
    bias = jnp.broadcast_to(jnp.asarray(bias_win)[None, :, None, :],
                            (b, nwin, t, s_pad))
    if frame_valid is not None:
        bias = jnp.where(~frame_valid[:, None, :, None], -1e9, bias)
        bias_o = jnp.where(frame_valid[:, :, None], 0.0, -1e9)
        bias_o = jnp.broadcast_to(bias_o, (b, t, wa)).reshape(b, 1, nq)
    else:
        bias_o = jnp.zeros((b, 1, nq), jnp.float32)
    bias = bias.reshape(b * nwin, 1, t * s_pad)

    from e2fgvi_tpu.kernels.fused_attention import fused_focal_attention
    out = fused_focal_attention(qw, ko, vo, k_gath, v_gath, bias_o, bias,
                                b, heads, interpret)
    out = out[:, :nq, :]
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
    backend = _env_choice("E2FGVI_ATTENTION", "flash",
                          ("fused", "flash", "xla"))
    if (jax.default_backend() != "cpu"
            and q_win.dtype in (jnp.bfloat16, jnp.float16)
            and backend != "xla"):
        # 16-bit speed path only: the whole-key-axis blocks exceed the
        # scoped-VMEM budget at f32, and the f32 path is the parity path
        # where the kernel buys little
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
    import os

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
    # block_q: the whole padded q axis (measured ~2x over 256-blocks at
    # the bench geometry — K never re-streams). E2FGVI_FA_BQ=128|256|512
    # forces small blocks (debug escape hatch).
    bq_env = os.environ.get("E2FGVI_FA_BQ")
    if bq_env:
        bq = max(d for d in (512, 256, 128)
                 if nqp % d == 0 and d <= int(bq_env))
    elif nqp <= 1024:
        bq = nqp
    else:
        bq = max(d for d in (512, 256, 128) if nqp % d == 0)
    bs = fa.BlockSizes(block_q=bq,
                       block_k_major=nkp, block_k=min(512, nkp),
                       block_b=1)
    # this is the 16-bit speed path: pin matmul precision to 'default'
    # for the kernel's internal dots. A global 'highest' policy (the
    # correctness default of utils.env) stamps contract_precision<fp32>
    # onto bf16 vectors, which Mosaic rejects ("Bad lhs type").
    with jax.default_matmul_precision("default"):
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
    # default: conv form on TPU; the literal GEMM chain on CPU backends —
    # the lhs-dilated conv's vjp is pathologically slow to compile on
    # XLA:CPU (same reason as soft_comp's CPU gate; VERDICT r04 #1)
    default = "gemm" if jax.default_backend() == "cpu" else "conv"
    form = _env_choice("E2FGVI_F3N", default, ("conv", "gemm"))
    if form == "conv":
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

    xt = x.reshape(bt, lh, lw, c)
    # tokens -> pixels as ONE dense subpixel conv (see
    # _tokens_to_pixels_conv; conv dtype follows the activation like
    # linear() in mixed bf16/f32 setups), then the overlap-count
    # renormalization of fold_normalized
    z = _tokens_to_pixels_conv(xt, params["fc1"]["w"], params["fc1"]["b"],
                               output_size)
    cnt = fold_counts(output_size, T2T_KERNEL, T2T_STRIDE, T2T_PADDING,
                      dtype=jnp.float32)
    z = (z.astype(jnp.float32) / cnt[None]).astype(z.dtype)
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
    # weighted window reduction in the native layout (no (wh*ww)-minor
    # relayout of the full tensor): pool w is (wh*ww, 1) row-major over
    # (wh, ww) — contract it against the blocked spatial axes directly
    xw = x.reshape(b, t, nwh, wh, nww, ww, c)
    pw = params["pool"]["w"].reshape(wh, ww).astype(jnp.float32)
    pooled = jnp.einsum("btiyjxc,yx->btijc", xw.astype(jnp.float32), pw)
    pooled = (pooled + params["pool"]["b"].astype(jnp.float32)).astype(
        x.dtype)
    return pooled.transpose(0, 2, 3, 1, 4)             # (B, nWh, nWw, T, C)


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
    """Sequential block stack as ONE lax.scan over stacked block params:
    the block body is traced/compiled once instead of DEPTHS times (the
    stack dominated the window program's multi-minute XLA compile), and
    buffer reuse across iterations caps the stack's live-memory footprint
    at one block's working set."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)

    def body(z, p):
        out = transformer_block(p, z, output_size, num_heads, window_size,
                                focal_level, frame_valid=frame_valid)
        return out, None

    if remat:
        # training: recompute each block's internals in the backward pass
        # instead of saving per-block attention/F3N residuals
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stacked)
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
