"""Parity of the geometry-specialized focal-attention Pallas kernel
(kernels/focal_attention.py) against the f32 XLA softmax reference, in
interpret mode on the real serving geometry (scaled-down batch).

The kernel is the serving fast path's attention when
E2FGVI_ATTENTION=focal; its contract is softmax(q k^T + per-key bias) v
(reference tfocal_transformer.py:234-357, bias 300-316).
"""

import numpy as np
import jax
import jax.numpy as jnp

from e2fgvi_tpu.kernels import focal_attention as fa


def _mk(bw=3, heads=2, nq=765, nk=2210, hd=64, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((bw, heads, nq, hd)).astype(np.float32)
    k = rng.standard_normal((bw, heads, nk, hd)).astype(np.float32)
    v = rng.standard_normal((bw, heads, nk, hd)).astype(np.float32)
    bias = np.zeros((bw, nk), np.float32)
    # pooled-boundary -100 pattern + padding-frame -1e9 pattern
    bias[:, nk - 37: nk - 12] = -100.0
    bias[:, nk - 12:] = -1e9
    return q, k, v, bias


def test_focal_attention_matches_xla_f32():
    q, k, v, bias = _mk()
    got = np.asarray(fa._forward(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), jnp.asarray(bias),
                                 interpret=True))
    want = np.asarray(fa._xla_reference(jnp.asarray(q), jnp.asarray(k),
                                        jnp.asarray(v), jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_focal_attention_bf16_close_to_f32():
    q, k, v, bias = _mk(bw=2, heads=1, nq=253, nk=517, hd=32, seed=1)
    got = np.asarray(fa._forward(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias),
        interpret=True)).astype(np.float32)
    want = np.asarray(fa._xla_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias)))
    # bf16 inputs: same accuracy class as the stock flash path
    err = np.abs(got - want).max()
    assert err < 0.05, err


def test_focal_attention_grad_matches_xla():
    q, k, v, bias = _mk(bw=1, heads=1, nq=61, nk=133, hd=16, seed=2)
    args = tuple(jnp.asarray(a) for a in (q, k, v, bias))

    def loss_kernel(*a):
        return jnp.sum(fa.focal_attention(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(fa._xla_reference(*a) ** 2)

    # interpret-mode forward under the custom_vjp: patch _forward's
    # default; on CPU the pallas_call must run interpreted
    import functools
    orig = fa._forward
    fa._forward = functools.partial(orig, interpret=True)
    try:
        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    finally:
        fa._forward = orig
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
