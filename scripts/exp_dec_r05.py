"""Split decoder_local_B (~76 ms/video, results/profile_r05.json) into
its parts: the two x2 align-corners resizes (bf16 interp-matrix einsums)
vs the three convs, plus alternative resize formulations — the stage
runs ~3x over its conv roofline and the h-axis einsum's contraction over
a non-minor dim is the prime relayout suspect.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_dec_r05.py
"""

import os
import sys

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.models import e2fgvi  # noqa: E402
from e2fgvi_tpu.ops.convs import conv2d  # noqa: E402
from e2fgvi_tpu.ops.resize import (_interp_matrix,  # noqa: E402
                                   resize_scale2_aligned)
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

N = 14 * 11
HQ, WQ, C = 60, 108, 128
DT = jnp.bfloat16


def main():
    rng = np.random.default_rng(0)
    params = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    params = jax.tree.map(
        lambda x: x.astype(DT) if hasattr(x, "astype")
        and x.dtype == jnp.float32 else x, params)
    dec = params["decoder"]
    x0 = jnp.asarray(rng.standard_normal((N, HQ, WQ, C)), DT)
    x1 = jnp.asarray(rng.standard_normal((N, 2 * HQ, 2 * WQ, C)), DT)
    x1b = jnp.asarray(rng.standard_normal((N, 2 * HQ, 2 * WQ, 64)), DT)
    x2 = jnp.asarray(rng.standard_normal((N, 4 * HQ, 4 * WQ, 64)), DT)

    def full(p, x):
        return jnp.tanh(e2fgvi.decode(p, x))

    def r1(x):
        return resize_scale2_aligned(x)

    def r2(x):
        return resize_scale2_aligned(x)

    def r1_flat(x):
        """Same math, contraction framed as (u,h)@(h, w*c) / (v,w)@(w,c)
        batched GEMMs on a flattened view."""
        n, h, w, c = x.shape
        mw = jnp.asarray(_interp_matrix(w, 2 * w, True), DT)
        mh = jnp.asarray(_interp_matrix(h, 2 * h, True), DT)
        y = jax.lax.dot_general(
            mw, x.reshape(n * h, w, c), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (2w, nh, c)
        y = y.astype(DT).transpose(1, 0, 2).reshape(n, h, 2 * w * c)
        z = jax.lax.dot_general(
            mh, y, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (2h, n, 2w*c)
        return z.astype(DT).transpose(1, 0, 2).reshape(n, 2 * h, 2 * w, c)

    def c1(x):
        return conv2d(x, dec[0]["w"], dec[0]["b"], padding=1)

    def c2(x):
        return conv2d(x, dec[1]["w"], dec[1]["b"], padding=1)

    def c3(x):
        return conv2d(x, dec[2]["w"], dec[2]["b"], padding=1)

    def c4(x):
        return conv2d(x, dec[3]["w"], dec[3]["b"], padding=1)

    want = np.asarray(jax.jit(r1)(x0), np.float32)
    got = np.asarray(jax.jit(r1_flat)(x0), np.float32)
    err = np.abs(want - got).max()
    print(f"flat-GEMM resize max err {err:.3e}", flush=True)

    for name, fn, args in [
            ("resize1 60x108x128 -> 2x", jax.jit(r1), (x0,)),
            ("resize1 flat-GEMM form", jax.jit(r1_flat), (x0,)),
            ("conv1 128->128 @120x216", jax.jit(c1), (x1,)),
            ("conv2 128->64  @120x216", jax.jit(c2), (x1,)),
            ("resize2 120x216x64 -> 2x", jax.jit(r2), (x1b,)),
            ("conv3 64->64 @240x432", jax.jit(c3), (x2,)),
            ("conv4 64->3  @240x432", jax.jit(c4), (x2,)),
            ("full decode+tanh", jax.jit(full), (dec, x0))]:
        dt = time_stage(fn, *args, iters=6)
        print(f"{name:28s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
