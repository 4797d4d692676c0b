"""Split the feat_prop step's non-kernel costs (r04).

exp_step_breakdown measured offset_head (4 convs + split) at 8.98 ms
against a ~1.2 ms MXU FLOP bound, and dcn_banded at 21.97 ms of which the
Pallas sweep is only part — this isolates:

  conv_stack        the 4 offset convs alone (raw (N,H,W,432) out)
  head_full         convs + _offsets_from_head (tanh/sigmoid/reshape)
  split_only        _offsets_from_head on a precomputed conv output
  pos_prep          offsets -> pyg/pxg/mg layouts + per-strip row bounds
                    (the XLA prelude of modulated_deform_conv2d_banded)
  einsum_only       the contraction on a precomputed sampled tensor
  dcn_banded        the full op (reference number)

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_offsets_r04.py
"""

import os

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.models import feat_prop  # noqa: E402
from e2fgvi_tpu.ops.convs import conv2d, leaky_relu  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, H, W, C = 14, 60, 108, 128
DTYPE = jnp.bfloat16
BAND = 24


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda x: x.astype(DTYPE),
        feat_prop.init_params(key, channel=C))
    p = params["backward"]["deform"]

    cond = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), DTYPE)
    flow = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 3, DTYPE)
    feat2 = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), DTYPE)

    def conv_stack(p, cond, flow):
        x = jnp.concatenate([cond, flow, flow], axis=-1)
        for i, cp in enumerate(p["conv_offset"]):
            x = conv2d(x, cp["w"], cp["b"], padding=1)
            if i < len(p["conv_offset"]) - 1:
                x = leaky_relu(x, 0.1)
        return x

    def head_full(p, cond, flow):
        return feat_prop._offsets_from_head(conv_stack(p, cond, flow),
                                            flow, flow)

    raw = jax.jit(conv_stack)(p, cond, flow)

    def split_only(raw, flow):
        return feat_prop._offsets_from_head(raw, flow, flow)

    offsets, mask = jax.jit(head_full)(p, cond, flow)
    offsets = jnp.clip(offsets, -8, 8)

    def pos_prep(x, offsets, mask):
        """The XLA prelude of modulated_deform_conv2d_banded: position
        layouts + per-strip bounds + the padded packed source — everything
        up to (but excluding) the pallas_call."""
        from e2fgvi_tpu.kernels import dcn_band as bl
        n, h, wdt, cin = x.shape
        g = offsets.shape[3]
        cg = cin // g
        k = offsets.shape[4]
        ho, wo = h, wdt
        dy_lo = -(BAND // 2)
        hp = -(-ho // 8) * 8
        wp = bl.LANES
        off = offsets.astype(jnp.float32)
        ky = jnp.repeat(jnp.arange(3, dtype=jnp.float32), 3)
        kx = jnp.tile(jnp.arange(3, dtype=jnp.float32), 3)
        base_y = (jnp.arange(ho, dtype=jnp.float32)[:, None] - 1 + ky[None])
        base_x = (jnp.arange(wo, dtype=jnp.float32)[:, None] - 1 + kx[None])
        py = base_y[None, :, None, None, :] + off[..., 0]
        px = base_x[None, None, :, None, :] + off[..., 1]

        def pos_layout(pq):
            pq = pq.transpose(0, 3, 4, 1, 2).reshape(n * g, k, ho, wo)
            return jnp.pad(pq, ((0, 0), (0, 0), (0, hp - ho),
                                (0, wp - wo)), constant_values=-1e4)

        pyg, pxg = pos_layout(py), pos_layout(px)
        mg = pos_layout(mask.astype(jnp.float32))
        strips = bl._n_strips(hp)
        sr = hp // strips
        rel = off[..., 0] + (ky[None, None, None, None, :] - 1) - dy_lo
        pad5 = ((0, 0), (0, hp - ho), (0, 0), (0, 0), (0, 0))
        rel_min = jnp.pad(rel, pad5, constant_values=1e9).reshape(
            n, strips, sr, wo, g, k).min(axis=(2, 3))
        rel_max = jnp.pad(rel, pad5, constant_values=-1e9).reshape(
            n, strips, sr, wo, g, k).max(axis=(2, 3))
        row_lo = jnp.clip(jnp.floor(rel_min - 1), 0, BAND).astype(jnp.int32)
        row_hi = jnp.clip(jnp.ceil(rel_max + 1) + 1, 0, BAND).astype(
            jnp.int32)
        row_lo = row_lo.transpose(0, 2, 3, 1).reshape(n * g, k, strips)
        row_hi = row_hi.transpose(0, 2, 3, 1).reshape(n * g, k, strips)
        xs = x.reshape(n, h, wdt, g, cg).transpose(0, 3, 4, 1, 2)
        xs = xs.reshape(n * g, cg, h, wdt)
        xs = jnp.pad(xs, ((0, 0), (0, 0),
                          (-dy_lo, BAND + dy_lo + hp - h), (0, wp - wdt)))
        xs = bl._pack_pairs(xs)
        return pyg, pxg, mg, row_lo, row_hi, xs

    n, g, k = B, 16, 9
    cg = 2 * C // g
    hp, wp = 64, 128
    sampled = jnp.asarray(rng.standard_normal((n, g, k, cg, hp, wp)), DTYPE)

    def einsum_only(sampled, w):
        s = sampled[..., :H, :W].reshape(n, g * k * cg, H * W)
        wk = w.reshape(3, 3, g, cg, 128).transpose(2, 0, 1, 3, 4).reshape(
            g * k * cg, 128)
        return jnp.einsum("nip,io->npo", s, wk,
                          preferred_element_type=jnp.float32)

    def dcn_banded(x, offsets, mask, w, b):
        from e2fgvi_tpu.kernels.dcn_band import modulated_deform_conv2d_banded
        return modulated_deform_conv2d_banded(x, offsets, mask, w, b,
                                              band=BAND)

    pieces = [
        ("conv_stack (4 convs)", conv_stack, (p, cond, flow)),
        ("head_full (convs+split)", head_full, (p, cond, flow)),
        ("split_only", split_only, (raw, flow)),
        ("pos_prep (XLA prelude)", pos_prep, (feat2, offsets, mask)),
        ("einsum_only", einsum_only,
         (sampled, params["backward"]["deform"]["w"])),
        ("dcn_banded (full)", dcn_banded,
         (feat2, offsets, mask, params["backward"]["deform"]["w"],
          params["backward"]["deform"]["b"])),
    ]
    for name, fn, args in pieces:
        dt = time_stage(jax.jit(fn), *args, iters=8)
        print(f"{name:28s} {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
