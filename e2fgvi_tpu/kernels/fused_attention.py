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

- the window's OWN keys never ride a gather at all: they are the same
  window partition as the queries (one cheap transpose of the compact
  maps), read per (b, head, window) like q. That is 21% of the key slots.
- XLA performs ONE static gather per k/v (`jnp.take` over a precomputed
  index table, models/tfocal.py:_key_gather_idx) for the remaining
  rolled + pooled keys into a (B*heads, T, nWin, S_pad, hd) layout —
  S_pad is the per-frame key count padded to the bf16 sublane tile so
  the kernel's (T, S_pad, hd) -> (T*S_pad, hd) view is layout-free.
  Padding slots index a zero row and carry a -1e9 bias. (Alternatives
  A/B'd and LOST: a one-hot MXU contraction — its FLOPs match the
  attention core; a combined 2KB-row take — XLA's gather prefers small
  rows; an in-kernel band-slice assembly — the VMEM relayouts ate the
  gain and Mosaic miscompiled it, scripts/exp_attn_band_r04.py.)
- the Pallas grid is (B, nWin, heads): each step reads its own-key block
  and its (T, S_pad, hd) gathered block straight from HBM (BlockSpec
  index maps do the window selection — no reassembly, no concat),
  computes both logit panels in VMEM, one f32 softmax across them
  (single pass: shared max, exp, shared sum), and two p@v MXU
  contractions.
- the bias is per-KEY only (pooled-boundary -100 exactly as the
  reference's additive mask, tfocal_transformer.py:300-316; -1e9 for
  padding frames/slots whose exp underflows to exactly 0 in f32), so
  masking costs one broadcast add per panel.
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


def _kernel(bias_o_ref, bias_g_ref, q_ref, ko_ref, vo_ref, kg_ref, vg_ref,
            o_ref):
    q = q_ref[0]                         # (nq_pad, hd) bf16
    ko = ko_ref[0]                       # (no, hd) own keys
    vo = vo_ref[0]
    t, s_pad, hd = kg_ref.shape[1], kg_ref.shape[3], kg_ref.shape[4]
    kg = kg_ref[0, :, 0].reshape(t * s_pad, hd)
    vg = vg_ref[0, :, 0].reshape(t * s_pad, hd)
    s1 = jax.lax.dot_general(q, ko, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s1 = s1 + bias_o_ref[0, 0][None, :]
    s2 = jax.lax.dot_general(q, kg, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = s2 + bias_g_ref[0, 0][None, :]
    m = jnp.maximum(jnp.max(s1, axis=1, keepdims=True),
                    jnp.max(s2, axis=1, keepdims=True))
    p1 = jnp.exp(s1 - m)
    p2 = jnp.exp(s2 - m)
    l = (jnp.sum(p1, axis=1, keepdims=True)
         + jnp.sum(p2, axis=1, keepdims=True))
    o = jax.lax.dot_general(p1.astype(vo.dtype), vo,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + jax.lax.dot_general(p2.astype(vg.dtype), vg,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    o_ref[0] = (o * (1.0 / l)).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build(b, heads, nwin, t, s_pad, nq_pad, no, hd, dtype_name,
           interpret):
    dtype = jnp.dtype(dtype_name).type
    nk = t * s_pad
    return pl.pallas_call(
        _kernel,
        grid=(b, nwin, heads),
        in_specs=[
            # biases: own (B, 1, no) per batch; gathered (B*nWin, 1, nk)
            # shared across heads — heads iterate fastest so the block is
            # fetched once per (b, window)
            pl.BlockSpec((1, 1, no), lambda i, w, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda i, w, h: (i * nwin + w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_pad, hd),
                         lambda i, w, h: ((i * heads + h) * nwin + w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, no, hd),
                         lambda i, w, h: ((i * heads + h) * nwin + w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, no, hd),
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


def _xla_reference(q_bhw, ko, vo, k_gath, v_gath, bias_o, bias_g, b,
                   heads):
    """Equivalent XLA formulation on the split layout (backward path +
    CPU parity oracle)."""
    bh, t, nwin, s_pad, hd = k_gath.shape
    nq_pad = q_bhw.shape[1]
    no = ko.shape[1]
    q = q_bhw.reshape(b, heads, nwin, nq_pad, hd)
    kow = ko.reshape(b, heads, nwin, no, hd)
    vow = vo.reshape(b, heads, nwin, no, hd)
    k = k_gath.reshape(b, heads, t, nwin, s_pad, hd)
    k = k.transpose(0, 1, 3, 2, 4, 5).reshape(b, heads, nwin,
                                              t * s_pad, hd)
    v = v_gath.reshape(b, heads, t, nwin, s_pad, hd)
    v = v.transpose(0, 1, 3, 2, 4, 5).reshape(b, heads, nwin,
                                              t * s_pad, hd)
    s1 = jnp.einsum("bhwqd,bhwkd->bhwqk", q, kow,
                    preferred_element_type=jnp.float32)
    s1 = s1 + bias_o.reshape(b, 1, 1, 1, no)
    s2 = jnp.einsum("bhwqd,bhwkd->bhwqk", q, k,
                    preferred_element_type=jnp.float32)
    s2 = s2 + bias_g.reshape(b, 1, nwin, 1, t * s_pad)
    s = jnp.concatenate([s1, s2], axis=-1)
    p = jax.nn.softmax(s, axis=-1)
    p1, p2 = p[..., :no], p[..., no:]
    o = jnp.einsum("bhwqk,bhwkd->bhwqd", p1.astype(q.dtype), vow,
                   preferred_element_type=jnp.float32)
    o = o + jnp.einsum("bhwqk,bhwkd->bhwqd", p2.astype(q.dtype), v,
                       preferred_element_type=jnp.float32)
    o = o.astype(q.dtype)
    # (b, heads, nwin, nq, hd) -> (b*nwin, nq, heads*hd)
    return o.transpose(0, 2, 3, 1, 4).reshape(b * nwin, nq_pad,
                                              heads * hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_focal_attention(q_bhw, ko, vo, k_gath, v_gath, bias_o, bias_g,
                          b, heads, interpret=False):
    """See _kernel/_build. q_bhw/ko/vo: (b*heads*nwin, {nq_pad|no}, hd);
    k_gath/v_gath: (b*heads, t, nwin, s_pad, hd); bias_o: (b, 1, no);
    bias_g: (b*nwin, 1, t*s_pad)."""
    bh, t, nwin, s_pad, hd = k_gath.shape
    nq_pad = q_bhw.shape[1]
    no = ko.shape[1]
    fn = _build(b, heads, nwin, t, s_pad, nq_pad, no, hd,
                jnp.dtype(q_bhw.dtype).name, interpret)
    # bf16 MXU dots inside the kernel: a global 'highest' matmul precision
    # stamps contract_precision<fp32> onto bf16 vectors, which Mosaic
    # rejects — pin default within the call
    with jax.default_matmul_precision("default"):
        return fn(bias_o, bias_g, q_bhw, ko, vo, k_gath, v_gath)


def _fwd(q_bhw, ko, vo, k_gath, v_gath, bias_o, bias_g, b, heads,
         interpret=False):
    out = fused_focal_attention(q_bhw, ko, vo, k_gath, v_gath, bias_o,
                                bias_g, b, heads, interpret)
    return out, (q_bhw, ko, vo, k_gath, v_gath, bias_o, bias_g)


def _bwd(b, heads, interpret, res, g):
    _, vjp = jax.vjp(
        lambda q, ko, vo, kk, vv, bo, bg: _xla_reference(
            q, ko, vo, kk, vv, bo, bg, b, heads), *res)
    return vjp(g)


fused_focal_attention.defvjp(_fwd, _bwd)
