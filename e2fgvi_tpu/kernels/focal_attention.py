"""Specialized Pallas attention for the temporal-focal geometry.

The serving attention (models/tfocal.py:window_attention) is
softmax(q k^T + bias) v with, per (window, head): nq ~765 query tokens,
nk ~2210 keys, hd 128 — and a bias that is per-KEY only (pooled-boundary
-100 / padding -1e9, constant over queries; reference
tfocal_transformer.py:300-316). The stock flash-attention kernel spends
most of its time on bookkeeping this shape doesn't need: online-softmax
accumulator rescaling per k-block, segment-id compares per logit tile,
and m/l state threading. At ~78 us per (window, head) unit measured, it
runs ~4x off the VPU/MXU floor.

This kernel exploits the geometry instead:

- whole-problem blocks: one grid step = one (window, head); q, k, v for
  the step live in VMEM (~1.4 MB), the f32 logits (nq_pad x nk_pad,
  ~7 MB) live in a VMEM scratch — no HBM round-trip, no per-block
  rescaling.
- two-pass softmax over k chunks: pass 1 computes logits chunks on the
  MXU (q k^T + per-key bias) and tracks the row max; pass 2 exponentiates
  against the final max, accumulates the row sum and the p@v MXU
  contraction. ~3 VPU passes over the logits vs the online kernel's ~6-8.
- the per-key bias rides as a (1, nk) f32 row added to each logits chunk
  — masking costs one broadcast add instead of compare+select tiles.
  -100 pooled-boundary keys keep their exact reference semantics (their
  exp underflows to subnormal/zero in f32 exactly as in the reference's
  f32 softmax).

Exactness: softmax in f32 (max-subtracted), p cast to bf16 for the p@v
MXU dot with f32 accumulation — the same accuracy class as the stock
flash path (validated ~5e-4 vs the f32 XLA reference in bf16).

Gradients: a custom_vjp recomputes the backward through the XLA
formulation on the saved inputs — the kernel stays forward-only; training
paths (which prefer remat-friendly stock flash) are unaffected by
default.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(q_ref, k_ref, v_ref, b_ref, o_ref, s_ref, *, nk_chunk):
    q = q_ref[0, 0]                      # (nq, hd) bf16
    nq = q.shape[0]
    nk = k_ref.shape[2]
    hd = q.shape[1]
    n_chunks = nk // nk_chunk

    # pass 1: logits chunks -> VMEM scratch, track row max
    m = jnp.full((nq, 1), -3e38, jnp.float32)
    for c in range(n_chunks):
        kc = k_ref[0, 0, c * nk_chunk:(c + 1) * nk_chunk]   # (ck, hd)
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (nq, ck)
        s = s + b_ref[0, 0, c * nk_chunk:(c + 1) * nk_chunk][None, :]
        s_ref[:, c * nk_chunk:(c + 1) * nk_chunk] = s
        m = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))

    # pass 2: exp against the final max, row sum + p@v accumulation
    l = jnp.zeros((nq, 1), jnp.float32)
    o = jnp.zeros((nq, hd), jnp.float32)
    for c in range(n_chunks):
        e = jnp.exp(s_ref[:, c * nk_chunk:(c + 1) * nk_chunk] - m)
        l = l + jnp.sum(e, axis=1, keepdims=True)
        vc = v_ref[0, 0, c * nk_chunk:(c + 1) * nk_chunk]   # (ck, hd)
        o = o + jax.lax.dot_general(
            e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o * (1.0 / l)).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build(bw, heads, nq, nk, hd, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name).type
    # k chunk: largest multiple of 128 dividing nk, capped near the stock
    # kernel's proven tile width
    nk_chunk = max(c for c in range(LANES, min(nk, 768) + 1, LANES)
                   if nk % c == 0)
    kern = functools.partial(_kernel, nk_chunk=nk_chunk)
    return pl.pallas_call(
        kern,
        grid=(bw, heads),
        in_specs=[
            pl.BlockSpec((1, 1, nq, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # (bw, 1, nk): a (1, 1, nk) block's trailing dims match the
            # array (Pallas requires last-two block dims divisible by
            # (8, 128) or equal to the array's)
            pl.BlockSpec((1, 1, nk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nq, hd), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, heads, nq, hd), dtype),
        scratch_shapes=[pltpu.VMEM((nq, nk), jnp.float32)],
        interpret=bool(interpret),
    )


def _forward(q_win, k_all, v_all, bias_full, interpret=False):
    """q_win: (BW, heads, nq, hd); k/v: (BW, heads, nk, hd);
    bias_full: (BW, nk_total) f32 where nk_total == nk (per-key bias,
    broadcast over heads and queries). Returns (BW, heads, nq, hd)."""
    bw, heads, nq, hd = q_win.shape
    nk = k_all.shape[2]
    pad_q = (-nq) % 8
    pad_k = (-nk) % LANES
    q = jnp.pad(q_win, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    k = jnp.pad(k_all, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    v = jnp.pad(v_all, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    bias = jnp.pad(bias_full.astype(jnp.float32), ((0, 0), (0, pad_k)),
                   constant_values=-1e9)[:, None, :]
    fn = _build(bw, heads, nq + pad_q, nk + pad_k, hd,
                jnp.dtype(q_win.dtype).name, interpret)
    # bf16 MXU dots inside the kernel: a global 'highest' matmul precision
    # stamps contract_precision<fp32> onto bf16 vectors, which Mosaic
    # rejects ("Bad lhs type") — pin default within the call
    with jax.default_matmul_precision("default"):
        out = fn(q, k, v, bias)
    return out[:, :, :nq, :]


def _xla_reference(q_win, k_all, v_all, bias_full):
    attn = jnp.einsum("bhqd,bhkd->bhqk", q_win, k_all,
                      preferred_element_type=jnp.float32)
    attn = attn + bias_full[:, None, None, :].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(q_win.dtype), v_all,
                      preferred_element_type=jnp.float32
                      ).astype(q_win.dtype)


@jax.custom_vjp
def focal_attention(q_win, k_all, v_all, bias_full):
    return _forward(q_win, k_all, v_all, bias_full)


def _fwd(q_win, k_all, v_all, bias_full):
    return focal_attention(q_win, k_all, v_all, bias_full), \
        (q_win, k_all, v_all, bias_full)


def _bwd(res, g):
    # backward through the mathematically-identical XLA formulation —
    # exact gradients of the reference math; the kernel stays forward-only
    _, vjp = jax.vjp(_xla_reference, *res)
    return vjp(g)


focal_attention.defvjp(_fwd, _bwd)
