"""Parity tests: models.tfocal vs torch oracles (test-only reimplementations
of soft split / soft composition / F3N / focal window attention from their
definitions, using torch primitives and torch-layout weights)."""

import math

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import tfocal

B, T, FH, FW, C = 1, 3, 20, 36, 64
HEADS = 4
WIN = (5, 9)
OUT_SIZE = (60, 108)
D_FF = 98  # 49 * 2 channels for the F3N patch trick


def _np(x):
    return np.asarray(x)


def _to_torch_linear(p):
    """my (in,out) -> torch Linear weight (out,in)."""
    return (torch.from_numpy(_np(p["w"]).T.copy()),
            torch.from_numpy(_np(p["b"]).copy()))


def _patchify_out(w_t, b_t, c, k):
    """torch-layout (out=(c,k)) weight from my (out=(k,c)) linear params."""
    out, cin = w_t.shape
    w = w_t.reshape(k, c, cin).permute(1, 0, 2).reshape(out, cin)
    b = b_t.reshape(k, c).T.reshape(-1)
    return w, b


def _patchify_in(w_t, b_t, c, k):
    out, cin = w_t.shape
    w = w_t.reshape(out, k, c).permute(0, 2, 1).reshape(out, cin)
    return w, b_t


def test_soft_split_parity(rng):
    params = {"embedding": {
        "w": jnp.asarray(rng.standard_normal((49 * C, 128),
                                             ).astype(np.float32) * 0.05),
        "b": jnp.asarray(rng.standard_normal(128).astype(np.float32))}}
    x = rng.standard_normal((B * T, *OUT_SIZE, C), dtype=np.float32)

    got = np.asarray(jax.jit(tfocal.soft_split, static_argnums=2)(
        params, jnp.asarray(x), B))

    # torch oracle: unfold (c-major) + linear with torch-layout weight
    wt, bt = _to_torch_linear(params["embedding"])  # (128, 49C) in my order
    wt, bt = _patchify_in(wt, bt, C, 49)
    t_x = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    u = F.unfold(t_x, (7, 7), padding=(3, 3), stride=(3, 3))  # (BT, C*49, L)
    tok = torch.einsum("ncl,hc->nlh", u, wt) + bt
    want = tok.reshape(B, T, FH, FW, 128).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_soft_comp_parity(rng):
    params = {
        "embedding": {
            "w": jnp.asarray(rng.standard_normal((128, 49 * C)
                                                 ).astype(np.float32) * 0.05),
            "b": jnp.asarray(rng.standard_normal(49 * C).astype(np.float32))},
        "bias": jnp.asarray(rng.standard_normal((*OUT_SIZE, C)
                                                ).astype(np.float32)),
    }
    tokens = rng.standard_normal((B, T, FH, FW, 128), dtype=np.float32)
    got = np.asarray(jax.jit(tfocal.soft_comp, static_argnums=(2, 3))(
        params, jnp.asarray(tokens), T, OUT_SIZE))

    wt, bt = _to_torch_linear(params["embedding"])      # (49C, 128) my order
    wt, bt = _patchify_out(wt, bt, C, 49)
    tt = torch.from_numpy(tokens.reshape(B * T, FH * FW, 128))
    feat = torch.einsum("nlh,ch->nlc", tt, wt) + bt     # (BT, L, C*49)
    img = F.fold(feat.permute(0, 2, 1), OUT_SIZE, (7, 7), padding=(3, 3),
                 stride=(3, 3))
    img = img + torch.from_numpy(_np(params["bias"]).transpose(2, 0, 1))
    want = np.moveaxis(img.numpy(), 1, -1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_f3n_parity(rng):
    dim = 32
    params = {
        "fc1": {"w": jnp.asarray(rng.standard_normal((dim, D_FF)
                                                     ).astype(np.float32) * 0.1),
                "b": jnp.asarray(rng.standard_normal(D_FF).astype(np.float32))},
        "fc2": {"w": jnp.asarray(rng.standard_normal((D_FF, dim)
                                                     ).astype(np.float32) * 0.1),
                "b": jnp.asarray(rng.standard_normal(dim).astype(np.float32))},
    }
    n = T * FH * FW
    x = rng.standard_normal((B, n, dim), dtype=np.float32)
    got = np.asarray(jax.jit(tfocal.fusion_feed_forward,
                             static_argnums=(2, 3))(
        params, jnp.asarray(x), T, OUT_SIZE))

    # torch oracle with torch-layout (c-major) weights
    cch = D_FF // 49
    w1, b1 = _to_torch_linear(params["fc1"])
    w1, b1 = _patchify_out(w1, b1, cch, 49)
    w2, b2 = _to_torch_linear(params["fc2"])
    w2, b2 = _patchify_in(w2, b2, cch, 49)
    xt = torch.from_numpy(x)
    h = torch.einsum("bnc,hc->bnh", xt, w1) + b1        # (B, N, D_FF)
    n_vecs = FH * FW
    hh = h.reshape(B * T, n_vecs, D_FF).permute(0, 2, 1)
    ones = torch.ones(B * T, 49, n_vecs)
    fold = lambda z: F.fold(z, OUT_SIZE, (7, 7), padding=(3, 3), stride=(3, 3))
    mixed = F.unfold(fold(hh) / fold(ones), (7, 7), padding=(3, 3),
                     stride=(3, 3))
    mixed = mixed.permute(0, 2, 1).reshape(B, n, D_FF)
    y = F.gelu(mixed)
    want = (torch.einsum("bnh,ch->bnc", y, w2) + b2).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _torch_focal_attention(x, pooled, wqkv, bqkv, wproj, bproj):
    """Oracle for focal window attention, torch-mirror of the reference
    recipe (tfocal_transformer.py:210-399): own keys + 4 diagonal rolls
    (keeping out-of-window positions) + fc-pooled coarse keys unfolded per
    window with a -100 out-of-grid bias."""
    b, t, h, w, c = x.shape
    wh, ww = WIN
    eh, ew = wh // 2, ww // 2
    heads = HEADS
    hd = c // heads
    nwh, nww = h // wh, w // ww
    scale = hd ** -0.5

    def qkv(z):
        out = torch.einsum("...c,dc->...d", z, wqkv) + bqkv
        return out.chunk(3, dim=-1)

    q, k, v = qkv(x)

    def part(z):
        z = z.reshape(b, t, nwh, wh, nww, ww, c)
        z = z.permute(0, 2, 4, 1, 3, 5, 6).contiguous()
        return z.reshape(b * nwh * nww, t, wh * ww, c)

    def heads_of(z):
        bw, tt, nn, _ = z.shape
        return z.reshape(bw, tt * nn, heads, hd).permute(0, 2, 1, 3)

    q_win = heads_of(part(q)) * scale
    k_all = [heads_of(part(k))]
    v_all = [heads_of(part(v))]

    # rolled keys
    masks = []
    for (sy, sx) in ((-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)):
        m = torch.ones(wh, ww)
        ys = slice(None, -eh) if sy < 0 else slice(eh, None)
        xs = slice(None, -ew) if sx < 0 else slice(ew, None)
        m[ys, xs] = 0
        masks.append(m)
    valid = torch.nonzero(torch.stack(masks, 0).flatten()).flatten()
    rk, rv = [], []
    for (sy, sx) in ((-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)):
        rk.append(part(torch.roll(k, (sy, sx), dims=(2, 3))))
        rv.append(part(torch.roll(v, (sy, sx), dims=(2, 3))))
    rk = torch.cat(rk, 2)[:, :, valid]
    rv = torch.cat(rv, 2)[:, :, valid]
    k_all.append(heads_of(rk))
    v_all.append(heads_of(rv))

    # pooled keys
    kk = (2 * (wh // 2) + 1, 2 * (ww // 2) + 1)
    pp = (kk[0] // 2, kk[1] // 2)
    _, kp, vp = qkv(pooled)                       # (B, nWh, nWw, T, C)

    def pooled_keys(z):
        z = z.permute(0, 3, 4, 1, 2).reshape(b * t, c, nwh, nww)
        u = F.unfold(z, kk, padding=pp, stride=1)  # (BT, C*kk, L=nwh*nww)
        u = u.reshape(b, t, c, kk[0] * kk[1], nwh * nww)
        u = u.permute(0, 4, 1, 3, 2).reshape(b * nwh * nww, t,
                                             kk[0] * kk[1], c)
        return heads_of(u)

    k_all.append(pooled_keys(kp))
    v_all.append(pooled_keys(vp))

    ones = torch.ones(1, 1, nwh, nww)
    um = F.unfold(ones, kk, padding=pp, stride=1)[0, :, :]  # (kk, L)
    um = um.T                                              # (L=win, kk)
    bias_pool = torch.where(um > 0, torch.zeros(()),
                            torch.full((), -100.0))
    bias_pool = bias_pool[:, None, :].repeat(1, t, 1).reshape(
        nwh * nww, -1)                                     # (nWin, t*kk)

    K = torch.cat(k_all, 2)
    V = torch.cat(v_all, 2)
    attn = q_win @ K.transpose(-2, -1)
    npool = bias_pool.shape[1]
    bias_full = torch.cat(
        [torch.zeros(nwh * nww, attn.shape[-1] - npool), bias_pool], 1)
    attn = attn + bias_full.repeat(b, 1)[:, None, None, :]
    attn = attn.softmax(-1)
    out = (attn @ V).permute(0, 2, 1, 3).reshape(b * nwh * nww,
                                                 t * wh * ww, c)
    return torch.einsum("bnc,dc->bnd", out, wproj) + bproj


def test_window_attention_parity(rng):
    params = {
        "qkv": {"w": jnp.asarray(rng.standard_normal((C, 3 * C)
                                                     ).astype(np.float32) * 0.08),
                "b": jnp.asarray(rng.standard_normal(3 * C).astype(np.float32))},
        "proj": {"w": jnp.asarray(rng.standard_normal((C, C)
                                                      ).astype(np.float32) * 0.08),
                 "b": jnp.asarray(rng.standard_normal(C).astype(np.float32))},
    }
    x = rng.standard_normal((B, T, FH, FW, C), dtype=np.float32)
    nwh, nww = FH // WIN[0], FW // WIN[1]
    pooled = rng.standard_normal((B, nwh, nww, T, C), dtype=np.float32)

    fn = jax.jit(tfocal.window_attention, static_argnums=(3, 4, 5))
    got = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(pooled),
                        HEADS, WIN, (WIN[0] // 2, WIN[1] // 2)))

    wq = torch.from_numpy(_np(params["qkv"]["w"]).T.copy())
    bq = torch.from_numpy(_np(params["qkv"]["b"]).copy())
    wp = torch.from_numpy(_np(params["proj"]["w"]).T.copy())
    bp = torch.from_numpy(_np(params["proj"]["b"]).copy())
    with torch.no_grad():
        want = _torch_focal_attention(
            torch.from_numpy(x), torch.from_numpy(pooled), wq, bq, wp, bp
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_f3n_conv_equals_gemm(rng):
    """The conv-form F3N (transposed conv + conv, gelu in pixel space) must
    match the literal GEMM+fold+unfold chain exactly (both are exact
    formulations of the reference F3N)."""
    import os
    dim = 32
    params = {
        "fc1": {"w": jnp.asarray(rng.standard_normal((dim, D_FF)
                                                     ).astype(np.float32) * 0.1),
                "b": jnp.asarray(rng.standard_normal(D_FF).astype(np.float32))},
        "fc2": {"w": jnp.asarray(rng.standard_normal((D_FF, dim)
                                                     ).astype(np.float32) * 0.1),
                "b": jnp.asarray(rng.standard_normal(dim).astype(np.float32))},
    }
    x = jnp.asarray(rng.standard_normal((B, T * FH * FW, dim),
                                        dtype=np.float32))
    conv = np.asarray(tfocal._fusion_feed_forward_conv(params, x, T,
                                                       OUT_SIZE))
    os.environ["E2FGVI_F3N"] = "gemm"
    try:
        gemm = np.asarray(tfocal.fusion_feed_forward(params, x, T,
                                                     OUT_SIZE))
    finally:
        del os.environ["E2FGVI_F3N"]
    np.testing.assert_allclose(conv, gemm, rtol=2e-5, atol=2e-5)
