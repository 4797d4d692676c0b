"""Fused focal window attention: gather-layout keys + whole-window softmax.

The serving hot spot of the transformer stack (reference
tfocal_transformer.py:234-399) is softmax(q k^T + bias) v where each
(window, head) attends over nk ~ T*210 keys assembled from three sources:
the window's own tokens, a 4-roll out-of-window multiset, and one pooled
coarse level. Round-3 shipped that assembly as an XLA slice-concat-stack
producing the fully replicated (B*nWin, heads, nk, hd) k/v tensors
(~1.6 GB/block at the bench geometry) before a separate flash-attention
call — the assembly alone measured 35.6 ms/block, more than the attention
core itself (results/exp_tfocal_b14_r03.txt).

This kernel removes the replicated tensors from the HBM dataflow:

- XLA performs ONE static gather (`jnp.take` over a precomputed index
  table, models/tfocal.py:_key_gather_idx) from the compact per-frame
  token maps into a (B*heads, T, nWin, S_pad, hd) layout — S_pad is the
  per-frame key count padded to the bf16 sublane tile so the kernel's
  (T, S_pad, hd) -> (T*S_pad, hd) view is layout-free. Padding slots
  index a zero row and carry a -1e9 bias.
- the Pallas grid is (B, nWin, heads): each step reads its (T, S_pad, hd)
  k/v block straight from the gathered layout (BlockSpec index maps do
  the window selection — no reassembly, no concat), computes the full
  (nq_pad, nk) logits in VMEM, one f32 softmax (single pass: max, exp,
  sum — no online rescaling, no segment bookkeeping), and one p@v MXU
  contraction.
- the bias is per-KEY only (pooled-boundary -100 exactly as the
  reference's additive mask, tfocal_transformer.py:300-316; -1e9 for
  padding frames/slots whose exp underflows to exactly 0 in f32), so
  masking costs one broadcast add.
- the output lands directly in (B*nWin, nq_pad, heads*hd) — the layout
  the projection GEMM consumes — by writing each head's block at lane
  offset h*hd, so no head transpose follows the kernel.

Gradients: custom_vjp recomputes the backward through the equivalent XLA
formulation on the saved (already-gathered) inputs; the kernel stays
forward-only.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(bias_ref, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                         # (nq_pad, hd) bf16
    t, s_pad, hd = k_ref.shape[1], k_ref.shape[3], k_ref.shape[4]
    k = k_ref[0, :, 0].reshape(t * s_pad, hd)
    v = v_ref[0, :, 0].reshape(t * s_pad, hd)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o * (1.0 / l)).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build(b, heads, nwin, t, s_pad, nq_pad, hd, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name).type
    nk = t * s_pad
    return pl.pallas_call(
        _kernel,
        grid=(b, nwin, heads),
        in_specs=[
            # bias (B*nWin, 1, nk): shared across heads — heads iterate
            # fastest so the block is fetched once per (b, window)
            pl.BlockSpec((1, 1, nk), lambda i, w, h: (i * nwin + w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_pad, hd),
                         lambda i, w, h: ((i * heads + h) * nwin + w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1, s_pad, hd),
                         lambda i, w, h: (i * heads + h, 0, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1, s_pad, hd),
                         lambda i, w, h: (i * heads + h, 0, w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # each head writes its hd-wide lane stripe of the (nq_pad, C)
        # projection-ready output
        out_specs=pl.BlockSpec((1, nq_pad, hd),
                               lambda i, w, h: (i * nwin + w, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nwin, nq_pad, heads * hd),
                                       dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )


def _xla_reference(q_bhw, k_gath, v_gath, bias, b, heads):
    """Equivalent XLA formulation on the gathered layout (backward path +
    CPU parity oracle)."""
    bh, t, nwin, s_pad, hd = k_gath.shape
    nq_pad = q_bhw.shape[1]
    q = q_bhw.reshape(b, heads, nwin, nq_pad, hd)
    k = k_gath.reshape(b, heads, t, nwin, s_pad, hd)
    k = k.transpose(0, 1, 3, 2, 4, 5).reshape(b, heads, nwin,
                                              t * s_pad, hd)
    v = v_gath.reshape(b, heads, t, nwin, s_pad, hd)
    v = v.transpose(0, 1, 3, 2, 4, 5).reshape(b, heads, nwin,
                                              t * s_pad, hd)
    s = jnp.einsum("bhwqd,bhwkd->bhwqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s + bias.reshape(b, 1, nwin, 1, t * s_pad)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhwqk,bhwkd->bhwqd", p.astype(q.dtype), v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    # (b, heads, nwin, nq, hd) -> (b*nwin, nq, heads*hd)
    return o.transpose(0, 2, 3, 1, 4).reshape(b * nwin, nq_pad, heads * hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_focal_attention(q_bhw, k_gath, v_gath, bias, b, heads,
                          interpret=False):
    """See _kernel/_build. b*heads must equal k_gath.shape[0]."""
    bh, t, nwin, s_pad, hd = k_gath.shape
    nq_pad = q_bhw.shape[1]
    fn = _build(b, heads, nwin, t, s_pad, nq_pad, hd,
                jnp.dtype(q_bhw.dtype).name, interpret)
    # bf16 MXU dots inside the kernel: a global 'highest' matmul precision
    # stamps contract_precision<fp32> onto bf16 vectors, which Mosaic
    # rejects — pin default within the call
    with jax.default_matmul_precision("default"):
        return fn(bias.reshape(b * nwin, 1, t * s_pad), q_bhw, k_gath,
                  v_gath)


def _fwd(q_bhw, k_gath, v_gath, bias, b, heads, interpret=False):
    out = fused_focal_attention(q_bhw, k_gath, v_gath, bias, b, heads,
                                interpret)
    return out, (q_bhw, k_gath, v_gath, bias)


def _bwd(b, heads, interpret, res, g):
    _, vjp = jax.vjp(
        lambda q, k, v, bb: _xla_reference(q, k, v, bb, b, heads), *res)
    return vjp(g)


fused_focal_attention.defvjp(_fwd, _bwd)
