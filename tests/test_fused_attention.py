"""Parity of the fused focal attention (gather layout + Pallas kernel,
kernels/fused_attention.py) against the slice-assembly XLA path, in
interpret mode on a scaled-down serving geometry.

The fused path is the TPU serving default (E2FGVI_ATTENTION=fused); it
must reproduce the reference attention exactly up to dtype: same key
multiset (own window + 4-roll out-of-window + pooled unfold, reference
tfocal_transformer.py:234-357), the additive -100 pooled-boundary mask
(300-316), and the uniform-geometry frame-validity masking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2fgvi_tpu.models import tfocal


def _inputs(b=2, t=4, h=10, w=18, c=64, heads=2, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    params = tfocal.init_block_params(jax.random.PRNGKey(seed), c, (5, 9),
                                      d_ff=4 * c)
    x = jnp.asarray(rng.standard_normal((b, t, h, w, c)), dtype)
    pooled = tfocal._pool_level(params, x, (5, 9))
    return params["attn"], x, pooled


def _qkv_maps(params, x, pooled, heads):
    c = x.shape[-1]
    hd = c // heads
    wq = params["qkv"]["w"].reshape(c, 3, heads, hd)
    bq = params["qkv"]["b"].reshape(3, heads, hd)
    qkv = jnp.einsum("btyxc,cghd->gbhtyxd", x, wq.astype(x.dtype))
    qkv = qkv + bq[:, None, :, None, None, None, :].astype(qkv.dtype)
    pq = jnp.einsum("byxtc,cghd->gbhtyxd", pooled, wq.astype(x.dtype))
    pq = pq + bq[:, None, :, None, None, None, :].astype(pq.dtype)
    return qkv[0], qkv[1], qkv[2], pq


@pytest.mark.parametrize("frame_valid", [False, True])
def test_fused_matches_slice_assembly_xla(monkeypatch, frame_valid):
    heads = 2
    params, x, pooled = _inputs()
    b, t = x.shape[0], x.shape[1]
    fv = None
    if frame_valid:
        fv_np = np.ones((b, t), np.bool_)
        fv_np[0, -1] = False
        fv_np[1, -2:] = False
        fv = jnp.asarray(fv_np)

    monkeypatch.setenv("E2FGVI_ATTENTION", "xla")
    want = np.asarray(tfocal.window_attention(
        params, x, pooled, heads, (5, 9), (2, 4), frame_valid=fv))

    q, k, v, pq = _qkv_maps(params, x, pooled, heads)
    hd = x.shape[-1] // heads
    got = np.asarray(tfocal._window_attention_fused(
        params, q, k, v, pq, hd ** -0.5, (5, 9), (2, 4), fv,
        interpret=True))
    # padded frames' own outputs are garbage the caller discards — compare
    # only valid queries. Rows are (window, t*wh*ww) with t-major queries.
    if fv is not None:
        nwin = want.shape[0] // b
        wa = 45
        valid_q = np.repeat(fv_np, wa, axis=1)          # (b, t*45)
        valid_q = np.repeat(valid_q, nwin, axis=0)      # (b*nwin, t*45)
        got = np.where(valid_q[..., None], got, 0.0)
        want = np.where(valid_q[..., None], want, 0.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_bf16_close_to_f32_reference(monkeypatch):
    heads = 2
    params, x, pooled = _inputs()
    monkeypatch.setenv("E2FGVI_ATTENTION", "xla")
    want = np.asarray(tfocal.window_attention(
        params, x, pooled, heads, (5, 9), (2, 4))).astype(np.float32)

    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    q, k, v, pq = _qkv_maps(params16, x.astype(jnp.bfloat16),
                            pooled.astype(jnp.bfloat16), heads)
    hd = x.shape[-1] // heads
    got = np.asarray(tfocal._window_attention_fused(
        params16, q, k, v, pq, hd ** -0.5, (5, 9), (2, 4), None,
        interpret=True)).astype(np.float32)
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    assert err / scale < 0.05, (err, scale)


def test_fused_grad_matches_xla_reference():
    """custom_vjp backward (through the gathered-layout XLA formulation)
    against numerical grads of the forward."""
    from e2fgvi_tpu.kernels import fused_attention as fat

    rng = np.random.default_rng(3)
    b, heads, nwin, t, s_pad, hd, nq_pad, no = 1, 2, 2, 2, 16, 8, 16, 8
    q = jnp.asarray(rng.standard_normal((b * heads * nwin, nq_pad, hd)),
                    jnp.float32)
    ko = jnp.asarray(rng.standard_normal((b * heads * nwin, no, hd)),
                     jnp.float32)
    vo = jnp.asarray(rng.standard_normal((b * heads * nwin, no, hd)),
                     jnp.float32)
    k = jnp.asarray(rng.standard_normal((b * heads, t, nwin, s_pad, hd)),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((b * heads, t, nwin, s_pad, hd)),
                    jnp.float32)
    bias_o = jnp.zeros((b, 1, no), jnp.float32)
    bias_g = jnp.zeros((b * nwin, 1, t * s_pad), jnp.float32)

    def loss_kernel(q, ko, vo, k, v):
        return jnp.sum(fat.fused_focal_attention(
            q, ko, vo, k, v, bias_o, bias_g, b, heads, True) ** 2)

    def loss_ref(q, ko, vo, k, v):
        return jnp.sum(fat._xla_reference(
            q, ko, vo, k, v, bias_o, bias_g, b, heads) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(q, ko, vo, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, ko, vo, k, v)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-5, atol=2e-5)


def test_dedupe_matches_full_multiset(monkeypatch):
    """E2FGVI_ATTN_DEDUPE=on (the default) collapses duplicate (key, bias)
    slots with a log-multiplicity bias — exp(l + ln n) = n exp(l), so the
    softmax normalizer and value average are unchanged up to f32
    rounding. Must match the undeduped fused path to tight tolerance."""
    heads = 2
    params, x, pooled = _inputs()
    q, k, v, pq = _qkv_maps(params, x, pooled, heads)
    hd = x.shape[-1] // heads
    monkeypatch.setenv("E2FGVI_ATTN_DEDUPE", "off")
    want = np.asarray(tfocal._window_attention_fused(
        params, q, k, v, pq, hd ** -0.5, (5, 9), (2, 4), None,
        interpret=True))
    monkeypatch.setenv("E2FGVI_ATTN_DEDUPE", "on")
    got = np.asarray(tfocal._window_attention_fused(
        params, q, k, v, pq, hd ** -0.5, (5, 9), (2, 4), None,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_dedupe_table_counts():
    """The dedup table at the serving geometry: S shrinks 165 -> 125 and
    the multiplicity-weighted exp mass per (key set) is preserved."""
    import math as _m
    idx, n_fine = tfocal._key_gather_idx(20, 36, 5, 9, 2, 4,
                                         (4, 4, 5, 9, 2, 4))
    didx, dbias = tfocal._key_gather_dedup(20, 36, 5, 9, 2, 4,
                                           (4, 4, 5, 9, 2, 4))
    assert didx.shape[1] == 125
    wa = 45
    pm = tfocal._pooled_key_mask(4, 4, 5, 9, 2, 4)
    for wi in (0, 5, 15):
        full = ([(int(s), 0.0) for s in idx[wi, wa:n_fine]]
                + [(int(s), float(b))
                   for s, b in zip(idx[wi, n_fine:], pm[wi])])
        # exp-mass per source slot must match sum over dedup slots
        from collections import Counter
        cf = Counter(full)
        for (s, b), n in cf.items():
            j = [jj for jj in range(didx.shape[1])
                 if didx[wi, jj] == s and abs(dbias[wi, jj]
                                              - (b + _m.log(n))) < 1e-6]
            assert j, (wi, s, b, n)
